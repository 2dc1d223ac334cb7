"""Mixed-regime incremental maintenance E2E (round-5 verdict item 7):
the three maintenance regimes — retract/assert deltas
(:func:`snapshots.maintain_rollup`), dirty-group recompute
(:func:`snapshots.maintain_minmax_rollup`), and insert-only top-k
(:func:`snapshots.maintain_topk`) — composed over ONE shared corpus
snapshot store, driven by five generations of interleaved inserts,
updates, and deletes, with EVERY standing table asserted equal to its
from-scratch recompute after EVERY generation.

The top-k regime is insert-only by contract (a deleted or updated top
row would need the discarded (k+1)-th), so the composition exercises
the documented ROUTING rule: a generation that only inserts folds the
batch via maintain_topk; a generation containing updates or deletes
recomputes the top-k of the dirty groups (from :func:`snapshot_diff`)
from the new corpus version and carries clean groups' standing rows
forward verbatim — the same carry/recompute split maintain_minmax_
rollup uses internally.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hadoopxmlextractor_spark.snapshots import (
    commit_upsert,
    latest_version,
    maintain_minmax_rollup,
    maintain_rollup,
    maintain_topk,
    read_snapshot,
    snapshot_diff,
    write_snapshot,
)

K = 2
SCHEMA = "doc_id long, source string, n_chars long"
BATCH_SCHEMA = "doc_id long, source string, n_chars long, is_delete boolean"


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _recompute_rollup(corpus):
    return corpus.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total"),
    )


def _recompute_minmax(corpus):
    return corpus.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("n_chars").alias("min_val"),
        F.max("n_chars").alias("max_val"),
    )


def _recompute_topk(corpus):
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        corpus.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= K)
        .select("source", "doc_id", "n_chars")
    )


def test_mixed_regime_maintenance_over_shared_snapshot_store(spark, tmp_path):
    corpus_dir = str(tmp_path / "corpus")
    rollup_dir = str(tmp_path / "rollup")
    minmax_dir = str(tmp_path / "minmax")
    topk_dir = str(tmp_path / "topk")

    # five generations: inserts, then update+insert, then delete+insert,
    # then a group-moving update + a top-row delete, then insert-only
    gen0 = [
        (1, "web", 100), (2, "web", 200), (3, "web", 150),
        (4, "book", 500), (5, "book", 400),
    ]
    batches = [
        # g1: pure inserts (top-k folds via maintain_topk)
        [(6, "web", 300, False), (7, "news", 50, False)],
        # g2: update doc 2 upward (touches web's top-k) + insert
        [(2, "web", 250, False), (8, "book", 450, False)],
        # g3: DELETE the standing web maximum (doc 6) + insert
        [(6, "web", 0, True), (9, "news", 75, False)],
        # g4: doc 4 MOVES group book→web (dirties both) + delete doc 5
        [(4, "web", 500, False), (5, "book", 0, True)],
        # g5: pure inserts again (back on the insert-only fast path)
        [(10, "news", 60, False), (11, "web", 10, False)],
    ]

    write_snapshot(spark.createDataFrame(gen0, SCHEMA), corpus_dir)
    standing_topk = _recompute_topk(read_snapshot(spark, corpus_dir))
    write_snapshot(standing_topk, topk_dir)
    write_snapshot(_recompute_rollup(read_snapshot(spark, corpus_dir)), rollup_dir)
    write_snapshot(_recompute_minmax(read_snapshot(spark, corpus_dir)), minmax_dir)

    for g, rows in enumerate(batches, start=1):
        batch = spark.createDataFrame(rows, BATCH_SCHEMA)
        v_old = latest_version(corpus_dir)
        v_new = commit_upsert(
            spark, corpus_dir, batch, "doc_id", delete_col="is_delete"
        )
        old = read_snapshot(spark, corpus_dir, version=v_old)
        new = read_snapshot(spark, corpus_dir, version=v_new)

        # regime 1: retract/assert (handles updates, deletes, moves)
        rollup = maintain_rollup(old, new, "doc_id", "source", "n_chars")
        write_snapshot(rollup, rollup_dir)
        assert _rows(read_snapshot(spark, rollup_dir)) == _rows(
            _recompute_rollup(new)
        ), f"rollup diverged at generation {g}"

        # regime 2: dirty-group recompute (min/max under deletes)
        minmax = maintain_minmax_rollup(old, new, "doc_id", "source", "n_chars")
        write_snapshot(minmax, minmax_dir)
        assert _rows(read_snapshot(spark, minmax_dir)) == _rows(
            _recompute_minmax(new)
        ), f"minmax diverged at generation {g}"

        # regime 3: top-k with regime ROUTING — insert-only batches
        # fold through maintain_topk; generations with updates/deletes
        # recompute the dirty groups from the new corpus version
        standing = read_snapshot(spark, topk_dir)
        insert_only = all(not r[3] for r in rows) and not {
            r[0] for r in rows
        } & {x.doc_id for x in old.select("doc_id").collect()}
        if insert_only:
            merged = maintain_topk(
                standing,
                new.join(
                    spark.createDataFrame(
                        [(r[0],) for r in rows], "doc_id long"
                    ),
                    "doc_id",
                    "left_semi",
                ).select("source", "doc_id", "n_chars"),
                "source", "doc_id", "n_chars", k=K,
            )
        else:
            diff = snapshot_diff(
                spark, corpus_dir, v_old, v_new, "doc_id",
                compare_cols=["source", "n_chars"],
            )
            dirty = (
                old.join(diff, "doc_id", "left_semi").select("source")
                .unionByName(
                    new.join(diff, "doc_id", "left_semi").select("source")
                )
                .distinct()
            )
            carried = standing.join(F.broadcast(dirty), "source", "left_anti")
            recomputed = _recompute_topk(
                new.join(F.broadcast(dirty), "source", "left_semi")
            )
            merged = carried.unionByName(
                recomputed.select("source", "doc_id", "n_chars")
            )
        write_snapshot(merged.select("source", "doc_id", "n_chars"), topk_dir)
        assert _rows(read_snapshot(spark, topk_dir)) == _rows(
            _recompute_topk(new)
        ), f"top-k diverged at generation {g} (insert_only={insert_only})"

    # history consistency: every standing-table version g equals the
    # recompute over corpus version g (time travel on both stores)
    for g in range(len(batches) + 1):
        corpus_g = read_snapshot(spark, corpus_dir, version=g)
        assert _rows(read_snapshot(spark, rollup_dir, version=g)) == _rows(
            _recompute_rollup(corpus_g)
        )
        assert _rows(read_snapshot(spark, minmax_dir, version=g)) == _rows(
            _recompute_minmax(corpus_g)
        )
        assert _rows(read_snapshot(spark, topk_dir, version=g)) == _rows(
            _recompute_topk(corpus_g)
        )

    # the deletes really exercised the non-self-maintainable paths:
    # doc 6 (web max) was removed at g3, doc 5 (book) at g4
    final = read_snapshot(spark, corpus_dir)
    ids = {r.doc_id for r in final.select("doc_id").collect()}
    assert 6 not in ids and 5 not in ids
    final_topk = _rows(read_snapshot(spark, topk_dir))
    assert ("web", 6, 300) not in final_topk


def test_maintain_priority_sample_merge_equals_recompute(spark):
    """The fourth maintenance regime: bottom-(k+1) priority keys are
    insert-only self-maintainable — any merge sequence equals the
    from-scratch grouped sample, the rank-(k+1) threshold witness
    rides along, and cross-generation displacement is verified."""
    from hadoopxmlextractor_spark.snapshots import maintain_priority_sample

    # groups keyed mod 4, generations mod 3 — coprime, so every group
    # receives rows in every generation and displacement can occur
    rows = [(f"g{i % 4}", i, (i * 7919 + 13) % 100_000) for i in range(120)]
    df = spark.createDataFrame(rows, "grp string, id long, pkey long")
    k = 5

    def recompute(sub):
        return {
            (r.grp, r.id, r.pkey, r["rank"])
            for r in maintain_priority_sample(
                sub.limit(0), sub, "grp", "id", "pkey", k=k
            ).collect()
        }

    gens = [df.filter(F.col("id") % 3 == g) for g in range(3)]
    standing = maintain_priority_sample(
        gens[0].limit(0), gens[0], "grp", "id", "pkey", k=k
    )
    seen = gens[0]
    for g in gens[1:]:
        standing = maintain_priority_sample(
            standing.drop("rank"), g, "grp", "id", "pkey", k=k
        )
        seen = seen.unionByName(g)
        assert {
            (r.grp, r.id, r.pkey, r["rank"]) for r in standing.collect()
        } == recompute(seen)
    # every group carries its (k+1)-th threshold witness
    got = standing.collect()
    by_grp = {}
    for r in got:
        by_grp.setdefault(r.grp, set()).add(r["rank"])
    assert all(max(rs) == k + 1 for rs in by_grp.values())
    # displacement really happened: some generation-0 row fell out
    first = {r.id for r in maintain_priority_sample(
        gens[0].limit(0), gens[0], "grp", "id", "pkey", k=k).collect()}
    final = {r.id for r in got}
    assert first - final, "no displacement — the merge was vacuous"
