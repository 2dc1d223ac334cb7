"""Versioned table snapshots: time-travel reads, rollback, and
transactional-ish upserts over plain parquet directories.

The minimal lakehouse core a training-data pipeline needs to answer
"exactly which corpus did run X train on?": every commit writes a FULL
copy-on-write snapshot under ``v=<n>/`` and then flips a tiny
``_latest`` pointer file — readers either see the old version or the
new one, never a half-written directory (the parquet write completes
before the pointer moves, and a failed write leaves the pointer
untouched). Rollback is pointer assignment; old versions stay readable
until vacuumed. For streaming sinks the pointer payload additionally
carries ``last_batch_id`` so version durability and batch-committed
are one atomic rename (see :func:`last_committed_batch`); a crash
between a parquet write and its pointer flip leaves an orphan
``v=`` directory that version allocation skips and ``vacuum``
eventually reclaims.

Deliberately NOT a table format: no transaction log, no concurrent
writers, no file-level deltas — those need a real format (Delta,
Iceberg). What this keeps from them is the part reproducibility
depends on: immutable snapshots + an atomic latest pointer, built from
nothing but parquet and a rename. Scale note: copy-on-write rewrites
the table per commit, so at 100 TB you batch upserts (the
``commit_upsert`` batch argument is a DataFrame precisely so callers
accumulate); the read path is a plain pruned parquet scan of one
version directory — zero overhead vs an unversioned table.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from hadoopxmlextractor_spark.operators.corpus import upsert


def _latest_path(table_dir: str) -> str:
    return os.path.join(table_dir, "_latest")


def _read_pointer(table_dir: str) -> dict | None:
    try:
        with open(_latest_path(table_dir)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def latest_version(table_dir: str) -> int | None:
    p = _read_pointer(table_dir)
    return None if p is None else int(p["version"])


def last_committed_batch(table_dir: str) -> int:
    """Highest streaming batch_id whose commit flipped the pointer,
    or -1. Lives INSIDE the pointer payload so "version is durable"
    and "batch is marked committed" are ONE atomic os.replace — a
    crash can never leave a durable version whose batch looks
    uncommitted (the replay-double-apply window a separate marker
    file would open).

    Legacy compat: tables written before the marker moved into the
    pointer kept it in a separate ``_stream_commits.json``. A pointer
    WITHOUT ``last_batch_id`` therefore falls back to that file, so a
    crash-replayed batch that was already absorbed under the old
    scheme is still skipped (no double-applied sessions/top-k). The
    first new-scheme commit rewrites the pointer with the carried-
    forward marker, after which the legacy file is dead weight."""
    p = _read_pointer(table_dir)
    if p is None:
        return -1
    if "last_batch_id" in p:
        return int(p["last_batch_id"])
    try:
        with open(os.path.join(table_dir, "_stream_commits.json")) as f:
            return int(json.load(f)["last_batch_id"])
    except (FileNotFoundError, KeyError, ValueError, json.JSONDecodeError):
        return -1


def _flip_pointer(table_dir: str, version: int, batch_id: int | None = None) -> None:
    """Atomically commit ``version`` (and, for streaming sinks, the
    batch_id that produced it) in a single rename. ``batch_id=None``
    (non-streaming commits, rollback) carries the current marker
    forward unchanged so interleaved batch commits are never
    forgotten. NOTE: rollback therefore does NOT rewind the stream
    marker — restart streams from a fresh checkpoint after a
    rollback."""
    if batch_id is None:
        batch_id = last_committed_batch(table_dir)
    tmp = _latest_path(table_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": version, "last_batch_id": batch_id}, f)
    os.replace(tmp, _latest_path(table_dir))  # atomic on POSIX


def _next_version(table_dir: str) -> int:
    """Allocate the next version id as max(existing v= dirs)+1, NOT
    pointer+1: a crash between the parquet write and the pointer flip
    leaves an orphan directory the pointer never reached, and a
    rollback leaves diverged higher-numbered history — both must stay
    untouched (never block, never be clobbered by) the next commit.
    Orphans are unreferenced full snapshots; vacuum reclaims them."""
    try:
        versions = [
            int(d.split("=", 1)[1])
            for d in os.listdir(table_dir)
            if d.startswith("v=") and os.path.isdir(os.path.join(table_dir, d))
        ]
    except FileNotFoundError:
        versions = []
    return max(versions, default=-1) + 1


def write_snapshot(
    df: DataFrame, table_dir: str, *, batch_id: int | None = None
) -> int:
    """Write ``df`` as the next version; returns the new version id.
    The pointer flips only after the parquet write has finished; when
    ``batch_id`` is given (streaming sinks) it commits atomically WITH
    the version in the same pointer rename — crash-at-any-point replay
    either reruns the whole batch (pointer untouched, orphan directory
    ignored by :func:`_next_version`) or skips it (pointer carries the
    batch id), never double-applies."""
    nxt = _next_version(table_dir)
    df.write.mode("errorifexists").parquet(os.path.join(table_dir, f"v={nxt}"))
    _flip_pointer(table_dir, nxt, batch_id)
    return nxt


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read a specific version (time travel) or the latest."""
    v = latest_version(table_dir) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no snapshots in {table_dir}")
    return spark.read.parquet(os.path.join(table_dir, f"v={v}"))


def rollback(table_dir: str, version: int) -> None:
    """Point ``_latest`` back at an existing version."""
    if not os.path.isdir(os.path.join(table_dir, f"v={version}")):
        raise FileNotFoundError(f"version {version} not found in {table_dir}")
    _flip_pointer(table_dir, version)


def commit_upsert(
    spark: SparkSession,
    table_dir: str,
    batch: DataFrame,
    id_col: str,
    *,
    delete_col: str | None = None,
    batch_id: int | None = None,
) -> int:
    """MERGE ``batch`` into the latest snapshot and commit the result
    as a new version (read latest → :func:`~hadoopxmlextractor_spark.
    operators.corpus.upsert` → :func:`write_snapshot`). ``batch_id``
    threads through to the atomic pointer commit for streaming
    callers."""
    current = read_snapshot(spark, table_dir)
    return write_snapshot(
        upsert(current, batch, id_col, delete_col=delete_col),
        table_dir,
        batch_id=batch_id,
    )


def vacuum(table_dir: str, keep_last: int = 2) -> list[int]:
    """Delete snapshot directories older than the newest ``keep_last``
    versions, never touching the one ``_latest`` points at (a rolled-
    back pointer pins its target even if old). Returns the removed
    version ids. This is the storage-reclaim half of copy-on-write:
    every commit leaves a full prior snapshot behind, so unbounded
    history doubles storage per commit until vacuumed."""
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(table_dir)
        if d.startswith("v=") and os.path.isdir(os.path.join(table_dir, d))
    )
    pinned = latest_version(table_dir)
    removable = [
        v for v in versions[:-keep_last] if v != pinned
    ]
    for v in removable:
        shutil.rmtree(os.path.join(table_dir, f"v={v}"))
    return removable


def profile_drift(
    spark: SparkSession,
    table_dir: str,
    version_a: int,
    version_b: int,
    columns: list[str],
) -> DataFrame:
    """Column-profile DRIFT between two snapshot versions — the
    observability check a publish pipeline runs before flipping the
    pointer: per column, rows/nulls/distinct in each version and their
    deltas, so a bad upstream change (nulls exploding, cardinality
    collapsing) is visible as data, not as a training regression three
    days later. Each side is ONE Expand-scan profile (same shape as
    corpus_profile); the join is profile-sized (|columns| rows)."""
    from pyspark.sql import functions as F

    def profile(version: int) -> DataFrame:
        df = read_snapshot(spark, table_dir, version=version)
        wide = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                x
                for c in columns
                for x in (
                    (F.count(F.lit(1)) - F.count(c)).alias(f"{c}_nulls"),
                    F.countDistinct(c).alias(f"{c}_distinct"),
                )
            ],
        )
        stack = ", ".join(f"'{c}', {c}_nulls, {c}_distinct" for c in columns)
        return wide.selectExpr(
            f"stack({len(columns)}, {stack}) AS (col_name, n_nulls, n_distinct)",
            "n_rows",
        )

    a = profile(version_a).select(
        "col_name",
        F.col("n_rows").alias("rows_a"),
        F.col("n_nulls").alias("nulls_a"),
        F.col("n_distinct").alias("distinct_a"),
    )
    b = profile(version_b).select(
        "col_name",
        F.col("n_rows").alias("rows_b"),
        F.col("n_nulls").alias("nulls_b"),
        F.col("n_distinct").alias("distinct_b"),
    )
    return a.join(b, "col_name").select(
        "col_name",
        "rows_a",
        "rows_b",
        (F.col("rows_b") - F.col("rows_a")).alias("rows_delta"),
        "nulls_a",
        "nulls_b",
        (F.col("nulls_b") - F.col("nulls_a")).alias("nulls_delta"),
        "distinct_a",
        "distinct_b",
        (F.col("distinct_b") - F.col("distinct_a")).alias("distinct_delta"),
    )


def snapshot_diff(
    spark: SparkSession,
    table_dir: str,
    version_a: int,
    version_b: int,
    id_col: str,
    *,
    compare_cols: list[str],
) -> DataFrame:
    """Row-level change audit between two snapshot versions: one row
    per differing id with change ∈ {added, removed, changed} — the
    "what exactly moved between the corpus run X trained on and
    today's" question made a query. Full outer join on the id, change
    detection by md5 over the compared columns (so wide rows diff on
    one fixed-width digest, not column-by-column shuffles)."""
    from pyspark.sql import functions as F

    def keyed(version: int, tag: str) -> DataFrame:
        df = read_snapshot(spark, table_dir, version=version)
        digest = F.md5(
            F.concat_ws(
                "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                          for c in compare_cols]
            )
        )
        return df.select(F.col(id_col), digest.alias(f"h_{tag}"))

    a = keyed(version_a, "a")
    b = keyed(version_b, "b")
    joined = a.join(b, id_col, "full_outer")
    return joined.select(
        id_col,
        F.when(F.col("h_a").isNull(), "added")
        .when(F.col("h_b").isNull(), "removed")
        .when(F.col("h_a") != F.col("h_b"), "changed")
        .otherwise(None)
        .alias("change"),
    ).filter(F.col("change").isNotNull())


def maintain_rollup(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    group_col: str,
    sum_col: str,
) -> DataFrame:
    """Incremental aggregate maintenance: produce the NEW version's
    per-group rollup (count + sum) from the OLD rollup plus the
    row-level diff — never a rescan of the unchanged corpus. The
    materialized-view identity every warehouse leans on at scale:

        new_rollup = old_rollup
                     − Σ contributions of rows that left or changed
                     + Σ contributions of rows that arrived or changed

    A changed row retracts its OLD (group, value) and asserts its NEW
    one, so rows that MOVE groups maintain both groups correctly.
    Count and sum are the self-maintainable aggregates (no rescan on
    deletes, unlike min/max); the sum is exact BIGINT.

    At 100 TB the inputs come from the snapshot store: ``old`` via
    :func:`read_snapshot` time travel (or the previously persisted
    rollup directly) and the delta rows via :func:`snapshot_diff` —
    both diff-sized, never corpus-sized. Here the full-outer diff join
    is keyed on the unique id (uniform shuffle); everything after it
    is group-dimension-sized.
    """
    from pyspark.sql import functions as F

    o = old.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("g_old"),
        F.col(sum_col).cast("long").alias("v_old"),
    )
    n = new.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("g_new"),
        F.col(sum_col).cast("long").alias("v_new"),
    )
    j = o.join(n, "_id", "full_outer")
    diff = j.filter(
        ~(
            F.col("g_old").eqNullSafe(F.col("g_new"))
            & F.col("v_old").eqNullSafe(F.col("v_new"))
        )
    )
    retract = diff.filter(F.col("g_old").isNotNull()).select(
        F.col("g_old").alias("grp"),
        F.lit(-1).cast("long").alias("dn"),
        (-F.col("v_old")).alias("dv"),
    )
    assert_ = diff.filter(F.col("g_new").isNotNull()).select(
        F.col("g_new").alias("grp"),
        F.lit(1).cast("long").alias("dn"),
        F.col("v_new").alias("dv"),
    )
    delta = (
        retract.unionByName(assert_)
        .groupBy("grp")
        .agg(F.sum("dn").alias("dn"), F.sum("dv").alias("dv"))
    )
    base = o.groupBy(F.col("g_old").alias("grp")).agg(
        F.count(F.lit(1)).alias("n0"), F.sum("v_old").alias("t0")
    )
    return (
        base.join(delta, "grp", "full_outer")
        .select(
            F.col("grp").alias(group_col),
            (F.coalesce(F.col("n0"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0)))
            .cast("long")
            .alias("n_docs"),
            (F.coalesce(F.col("t0"), F.lit(0)) + F.coalesce(F.col("dv"), F.lit(0)))
            .cast("long")
            .alias("total"),
        )
        .filter(F.col("n_docs") > 0)
    )


def maintain_minmax_rollup(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    group_col: str,
    val_col: str,
) -> DataFrame:
    """Incremental maintenance for the NON-self-maintainable
    aggregates (min/max): a delete or update can remove the current
    extremum, so no retract/assert delta can produce the new value
    from the old rollup alone (the :func:`maintain_rollup` algebra is
    structurally impossible here). The correct incremental plan is
    DIRTY-GROUP recompute:

    1. diff the versions on the unique id (diff-sized, uniform key),
    2. mark every group an added/removed/changed row touches — under
       BOTH its old and new group, so group-moving rows dirty both,
    3. recompute min/max/count from the NEW version for the dirty
       groups ONLY (the dirty-group list is group-dimension-sized and
       broadcasts into the scan as a semi-join),
    4. carry every untouched group's old rollup forward VERBATIM —
       its rows are provably identical in both versions.

    Touch cost per refresh: O(|diff|) + O(rows of dirty groups) —
    never a rescan of clean groups, which is the entire point at
    100 TB where a daily batch touches a handful of partitions.
    Returns (group_col, n_docs, min_val, max_val); a group whose rows
    all vanish drops out (no rows → no recomputed entry; dirty by
    construction so never carried forward).

    INTEGER-COLUMN CONTRACT (like :func:`maintain_topk`'s insert-only
    contract): ``val_col`` is cast to BIGINT so the diff comparison
    and the extrema are engine-exact — a fractional column would be
    silently truncated. Pass integer measures (counts, cents,
    milliseconds); scale fractional values to integers first.
    """
    from pyspark.sql import functions as F

    o = old.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("g_old"),
        F.col(val_col).cast("long").alias("v_old"),
    )
    n = new.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("g_new"),
        F.col(val_col).cast("long").alias("v_new"),
    )
    j = o.join(n, "_id", "full_outer")
    diff = j.filter(
        ~(
            F.col("g_old").eqNullSafe(F.col("g_new"))
            & F.col("v_old").eqNullSafe(F.col("v_new"))
        )
    )
    dirty = (
        diff.select(F.col("g_old").alias("grp"))
        .unionByName(diff.select(F.col("g_new").alias("grp")))
        .filter(F.col("grp").isNotNull())
        .distinct()
    )
    old_roll = o.groupBy(F.col("g_old").alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("v_old").alias("min_val"),
        F.max("v_old").alias("max_val"),
    )
    carried = old_roll.join(F.broadcast(dirty), "grp", "left_anti")
    recomputed = (
        n.join(F.broadcast(dirty), n["g_new"] == dirty["grp"], "left_semi")
        .groupBy(F.col("g_new").alias("grp"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("v_new").alias("min_val"),
            F.max("v_new").alias("max_val"),
        )
    )
    return carried.unionByName(recomputed).select(
        F.col("grp").alias(group_col), "n_docs", "min_val", "max_val"
    )


def maintain_topk(
    standing_topk: DataFrame,
    new_rows: DataFrame,
    group_col: str,
    id_col: str,
    val_col: str,
    *,
    k: int,
) -> DataFrame:
    """Incremental per-group top-k maintenance under INSERT-ONLY
    arrival — the third maintenance regime alongside retract/assert
    deltas (:func:`maintain_rollup`) and dirty-group recompute
    (:func:`maintain_minmax_rollup`): top-k is SELF-MAINTAINABLE for
    inserts because a row outside the standing top-k can never enter
    any future top-k (values are immutable and k is fixed), so

        topk(all rows) = topk(standing topk ∪ new batch)

    holds exactly and the non-top-k history is never re-read. Cost per
    refresh: O(k·groups + batch) through one WindowGroupLimit-pushed
    rank. Ordering is deterministic — (value DESC, id ASC) — so ties
    resolve identically on every refresh and against any from-scratch
    recompute (oracle identity). NOT valid under deletes/updates: a
    removed top row would need the (k+1)-th, which was discarded —
    route those to dirty-group recompute.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    cols = [group_col, id_col, val_col]
    pool = standing_topk.select(cols).unionByName(new_rows.select(cols))
    w = Window.partitionBy(group_col).orderBy(
        F.col(val_col).desc(), F.col(id_col).asc()
    )
    return (
        pool.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def distribution_drift(
    old: DataFrame,
    new: DataFrame,
    value_col: str,
    *,
    n_buckets: int = 8,
) -> DataFrame:
    """Distributional drift between two versions of an integer column —
    the complement of :func:`profile_drift`'s rows/nulls/distinct: a
    two-sample chi-square over fixed equal-width buckets, the check
    that catches a SHAPE change (upstream truncation, a new source
    skewing lengths) that leaves row counts and cardinalities intact.

    Determinism contract: buckets are integer floor-divisions over the
    combined min/max (engine-identical on non-negative operands); the
    per-bucket chi-square terms are a fixed chain of IEEE double ops
    over integer counts, ROUNDed to 6 digits and accumulated as
    DECIMAL so the total is order-free (the maxsim discipline — a raw
    double SUM would depend on reduction order). Buckets empty across
    both versions contribute nothing (expected = 0 is skipped on both
    engines identically).

    Returns one row per occupied bucket: (bucket, n_old, n_new,
    term — that bucket's chi² contribution, rounded) plus the shared
    total ``chi2`` on every row (dimension-sized broadcast). Scale:
    two scan-bandwidth bucket projections, two n_buckets-sized
    aggregates, everything after is bucket-dimension-sized.
    """
    from pyspark.sql import functions as F

    o = old.select(F.col(value_col).cast("long").alias("v")).withColumn(
        "side", F.lit(0)
    )
    n = new.select(F.col(value_col).cast("long").alias("v")).withColumn(
        "side", F.lit(1)
    )
    both = o.unionByName(n)
    rng = both.agg(
        F.min("v").alias("vmin"), F.max("v").alias("vmax")
    )
    bucketed = both.crossJoin(F.broadcast(rng)).select(
        "side",
        F.least(
            F.lit(n_buckets - 1),
            F.expr(
                f"((v - vmin) * {n_buckets}) div (vmax - vmin + 1)"
            ).cast("int"),
        ).alias("bucket"),
    )
    counts = (
        bucketed.groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("side") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_old"),
            F.sum(F.when(F.col("side") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_new"),
        )
    )
    totals = counts.agg(
        F.sum("n_old").cast("double").alias("ta"),
        F.sum("n_new").cast("double").alias("tb"),
    )
    terms = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        "n_old",
        "n_new",
        F.round(
            (
                F.pow(
                    F.col("n_old").cast("double")
                    - (F.col("n_old") + F.col("n_new")).cast("double")
                    * F.col("ta")
                    / (F.col("ta") + F.col("tb")),
                    F.lit(2.0),
                )
                / (
                    (F.col("n_old") + F.col("n_new")).cast("double")
                    * F.col("ta")
                    / (F.col("ta") + F.col("tb"))
                )
            )
            + (
                F.pow(
                    F.col("n_new").cast("double")
                    - (F.col("n_old") + F.col("n_new")).cast("double")
                    * F.col("tb")
                    / (F.col("ta") + F.col("tb")),
                    F.lit(2.0),
                )
                / (
                    (F.col("n_old") + F.col("n_new")).cast("double")
                    * F.col("tb")
                    / (F.col("ta") + F.col("tb"))
                )
            ),
            6,
        ).alias("term"),
    )
    total = terms.agg(
        F.round(F.sum(F.col("term").cast("decimal(38,6)")).cast("double"), 6)
        .alias("chi2")
    )
    return terms.crossJoin(F.broadcast(total)).select(
        "bucket", "n_old", "n_new", "term", "chi2"
    )


def maintain_priority_sample(
    standing: DataFrame,
    new_rows: DataFrame,
    group_col: str,
    id_col: str,
    key_col: str,
    *,
    k: int,
) -> DataFrame:
    """Incremental maintenance of a per-group PRIORITY SAMPLE
    (:func:`operators.corpus.priority_sample_grouped`) under
    INSERT-ONLY arrival — the fourth entry in the maintenance-regime
    catalog, and the one that makes weighted sampling a STANDING TABLE
    a stream can keep current: bottom-(k+1) priority keys are
    mergeable exactly like a top-k (bottom(all) = bottom(standing ∪
    batch)), and retaining the (k+1)-th row keeps the DLT threshold —
    and with it every sampled row's estimator weight — derivable from
    the standing table alone, with the non-sample history never
    re-read.

    ``standing`` and ``new_rows`` carry (group, id, key) where ``key``
    is the integer priority (u·2^20 div w). Returns the merged
    bottom-(k+1) rows per group with their rank — rows ranked ≤ k are
    the sample, the rank-(k+1) row is the threshold witness (absent ⇒
    the group is exhaustively sampled, the tau=-1 branch). Ordering is
    deterministic — (key ASC, id ASC) — so any merge sequence equals
    the from-scratch sample (oracle identity). NOT valid under deletes
    (a removed sampled row would need the discarded (k+2)-th): route
    deletes to a dirty-group recompute, as with :func:`maintain_topk`.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    cols = [group_col, id_col, key_col]
    pool = standing.select(cols).unionByName(new_rows.select(cols))
    w = Window.partitionBy(group_col).orderBy(
        F.col(key_col).asc(), F.col(id_col).asc()
    )
    return (
        pool.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k + 1)
    )
