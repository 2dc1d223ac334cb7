#!/usr/bin/env python
"""Min-of-N timing for a subset of registry queries (noop sink), with
the bench's clearCache isolation. Usage:

    python scripts/bench_subset.py [-n N] <query> [query ...]

Prints one line per query: name, min, all samples.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = sys.argv[1:]
    n = 4
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    names = args

    import bench

    spark = bench.build_spark()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    qs["scan_filter_project"](spark, SF_DIR).count()  # warm

    for name in names:
        samples = []
        for _ in range(n):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(
            f"{name}: min {min(samples):.3f}s  "
            + " ".join(f"{s:.2f}" for s in samples),
            flush=True,
        )


if __name__ == "__main__":
    main()
