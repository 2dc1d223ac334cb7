from pyspark.sql import functions as F

from hadoopxmlextractor_spark.operators.assembly import assemble_rows


def _cells(spark, rows):
    return spark.createDataFrame(
        rows, schema="doc_id string, seq long, order int, value string"
    )


def test_forward_fill_and_trigger_emit(spark):
    cells = _cells(
        spark,
        [
            ("d1", 0, 0, "store"),
            ("d1", 10, 1, "phone"),
            ("d1", 20, 2, "Jan"),
            ("d1", 30, 3, "b1"),   # trigger (nr=4)
            ("d1", 40, 2, "Feb"),  # context update
            ("d1", 50, 3, "b2"),   # trigger again; col0/1 forward-filled
        ],
    )
    out = assemble_rows(cells, 4).orderBy("seq").collect()
    assert [tuple(r)[2:] for r in out] == [
        ("store", "phone", "Jan", "b1"),
        ("store", "phone", "Feb", "b2"),
    ]


def test_trigger_missing_suppresses_row(spark):
    # Highest-order column never arrives → zero rows (XmlExtractor.java:159).
    cells = _cells(spark, [("d1", 0, 0, "a"), ("d1", 1, 1, "b")])
    assert assemble_rows(cells, 3).count() == 0


def test_missing_middle_column_renders_space(spark):
    cells = _cells(spark, [("d1", 0, 0, "a"), ("d1", 5, 2, "t")])
    out = assemble_rows(cells, 3).collect()
    assert [tuple(r)[2:] for r in out] == [("a", " ", "t")]


def test_empty_string_cell_renders_space(spark):
    # Reference parity: a matched node with an EMPTY value renders as
    # the missing marker too (XmlExtractor.java:162-167 checks
    # col != null && !col.isEmpty()), and the empty assignment still
    # overwrites earlier forward-filled context.
    cells = _cells(
        spark,
        [
            ("d1", 0, 0, "ctx"), ("d1", 1, 2, "t1"),
            ("d1", 2, 0, ""),    # empty overwrites ctx in the fill state
            ("d1", 3, 2, "t2"),
        ],
    )
    out = assemble_rows(cells, 3).orderBy("seq").collect()
    assert [tuple(r)[2:] for r in out] == [("ctx", " ", "t1"), (" ", " ", "t2")]


def test_missing_value_none_keeps_nulls(spark):
    cells = _cells(spark, [("d1", 5, 2, "t")])
    out = assemble_rows(cells, 3, missing_value=None).collect()
    assert [tuple(r)[2:] for r in out] == [(None, None, "t")]


def test_fill_scoped_per_document(spark):
    cells = _cells(
        spark,
        [
            ("d1", 0, 0, "ctx1"), ("d1", 1, 1, "t1"),
            ("d2", 0, 1, "t2"),  # d2 has no order-0 cell → space, not ctx1
        ],
    )
    out = assemble_rows(cells, 2)
    got = {r["doc_id"]: (r["c0"], r["c1"]) for r in out.collect()}
    assert got == {"d1": ("ctx1", "t1"), "d2": (" ", "t2")}


def test_same_seq_lower_orders_applied_before_trigger(spark):
    # Cells at one seq are applied in order before the trigger emits
    # (secondary sort by (seq, order), XmlReducerKeySortComparator.java:14-28).
    cells = _cells(spark, [("d1", 7, 2, "t"), ("d1", 7, 0, "a"), ("d1", 7, 1, "b")])
    out = assemble_rows(cells, 3).collect()
    assert [tuple(r)[2:] for r in out] == [("a", "b", "t")]


def test_single_shuffle_plan(spark):
    # The assembly must compile to exactly one exchange (SURVEY.md §4:
    # partition-by-doc + sort-within-partitions, like the reference's
    # single MR shuffle).
    cells = _cells(spark, [("d1", 0, 0, "a")])
    plan = assemble_rows(cells, 2)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
