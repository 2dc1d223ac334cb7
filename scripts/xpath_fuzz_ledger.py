#!/usr/bin/env python
"""Per-round fresh-seed fuzz certification of the fused-XPath subset
(round-5 verdict item 5): re-run the cross-validation generator from
``tests/test_xpath_crossval.py`` with a NEW seed each round and record
the zero-divergence count in COVERAGE.md — cheap insurance on the
repo's most intricate pure-Python component. Any divergence should be
minimized into a probe-pinned test before the round closes.

Usage: PYTHONPATH=. python scripts/xpath_fuzz_ledger.py [seed] [n_exprs]
Prints one ledger line: seed, expressions checked, docs, divergences.
"""

from __future__ import annotations

import os
import random
import sys
import xml.etree.ElementTree as ET

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from hadoopxmlextractor_spark.xpath_subset import compile_subset, normalize_for_jvm
from tests.test_xpath_crossval import _gen_expr, _gen_tree

SEED = int(sys.argv[1]) if len(sys.argv) > 1 else 20260815
N_EXPRS = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
N_DOCS = 40


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("xpath-fuzz-ledger")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rng = random.Random(SEED)
    docs = [_gen_tree(rng, ns=(i % 4 == 3)) for i in range(N_DOCS)]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "i long, xml string"
    )
    trees = [ET.fromstring(d) for d in docs]

    checked = 0
    skipped = 0
    divergences: list[tuple[str, int, str | None, str | None]] = []
    while checked < N_EXPRS:
        expr = _gen_expr(rng)
        ev = compile_subset(expr)
        if ev is None:  # generator stays inside the subset; count anyway
            skipped += 1
            continue
        jvm_expr = normalize_for_jvm(expr)
        jvm = {
            r["i"]: "".join(x or "" for x in r["nodes"]) if r["nodes"] else None
            for r in df.select(
                "i", F.xpath("xml", F.lit(jvm_expr)).alias("nodes")
            ).collect()
        }
        for i, tree in enumerate(trees):
            fused = ev(tree)
            if (fused or "") != (jvm[i] or ""):
                divergences.append((expr, i, fused, jvm[i]))
        checked += 1
        if checked % 200 == 0:
            print(f"  ...{checked}/{N_EXPRS} exprs, {len(divergences)} divergences")

    print(
        f"LEDGER seed={SEED} exprs={checked} docs={N_DOCS} "
        f"outside_subset={skipped} divergences={len(divergences)}"
    )
    for d in divergences[:20]:
        print("  DIVERGED:", d)
    spark.stop()
    sys.exit(1 if divergences else 0)


if __name__ == "__main__":
    main()
