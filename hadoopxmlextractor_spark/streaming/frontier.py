"""Streaming crawl-frontier politeness gate.

The batch capstone (``pipeline_frontier_polite``) schedules a cycle's
top-K per host from the COMPLETE frontier; a live crawler also needs
the arrival-time form — targets stream in from extraction, and each
host's fetch slots fill in arrival order until the crawl-delay budget
for the cycle is spent. This is that operator, in the repo's standard
``applyInPandasWithState`` shape (streaming/dedup.py precedent):

- RFC 9309 admission is a STATELESS map-side Arrow filter (the same
  compiled per-host rule map as the batch capstone — broadcast-sized,
  no join, applied before any state is touched);
- per-host keyed state is ``(slots used, md5 digests of scheduled
  targets)`` — the slot counter enforces the crawl-delay budget
  (cycle seconds / delay, derived THROUGH robots_crawl_delay, never a
  constant) and the digest set makes scheduling idempotent across
  micro-batches (a re-discovered target never burns a second slot);
- emission is append-mode ``(host, slot, target)`` — slot numbers are
  stable and dense per host.

State boundedness: the digest set grows with scheduled targets only
(≤ budget entries per host per cycle — the budget gate runs BEFORE
the set is extended), so state per host is O(budget), not O(frontier).
Production resets cycles by restarting the query or keying state by
(host, cycle); the E2E test drives multiple micro-batches against the
same cycle and asserts idempotence, budget caps, and admission.
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from hadoopxmlextractor_spark.operators.text import (
    robots_admit_multi_udf,
    robots_crawl_delay,
)


def polite_schedule_stream(
    frontier: DataFrame,
    robots_by_host: dict[int, str],
    *,
    agent: str = "*",
    cycle_seconds: int = 60,
) -> DataFrame:
    """Streaming politeness scheduler over ``(host, k, path, target)``
    frontier rows: robots-disallowed targets drop map-side, then each
    host's state admits first-arrival targets (ties broken by target
    text within a micro-batch for determinism) up to its crawl-delay
    slot budget. Returns an append-mode stream of
    ``(host, slot, target)``."""
    budgets = {
        k: max(
            1,
            int(cycle_seconds
                // (robots_crawl_delay(txt, agent) or cycle_seconds)),
        )
        for k, txt in robots_by_host.items()
    }
    admit = robots_admit_multi_udf(robots_by_host, agent=agent)
    admitted = frontier.filter(admit("k", "path")).select(
        "host", "k", "target"
    )

    def _schedule(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        used, seen = (
            (state.get[0], set(state.get[1])) if state.exists
            else (0, set())
        )
        for pdf in pdfs:
            pdf = pdf.sort_values("target")
            out = []
            for _, row in pdf.iterrows():
                budget = budgets.get(int(row["k"]), 1)
                digest = hashlib.md5(
                    row["target"].encode()
                ).hexdigest()
                if digest in seen or used >= budget:
                    continue
                used += 1
                seen.add(digest)
                out.append({
                    "host": key[0], "slot": used,
                    "target": row["target"],
                })
            yield pd.DataFrame(
                out, columns=["host", "slot", "target"]
            )
        state.update((used, sorted(seen)))

    return admitted.groupBy("host").applyInPandasWithState(
        _schedule,
        outputStructType="host string, slot int, target string",
        stateStructType="used long, digests array<string>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
