"""Streaming SCD2: continuous dimension-history maintenance.

Per key the processor keeps the OPEN interval (state, since_ms,
version) in keyed state; when an arriving event changes the state it
emits the now-CLOSED interval and opens the next version. The emitted
append stream is exactly the ``eff_to_ms IS NOT NULL`` half of the
batch operator :func:`~hadoopxmlextractor_spark.operators.temporal.
scd2_history` — open rows live in the state store until their closing
change arrives (test-asserted equivalence).

Two implementations of the same processor logic:

- :func:`scd2_stream` — ``applyInPandasWithState`` (works everywhere).
- :func:`scd2_stream_tws` — the Spark 4 ``transformWithStateInPandas``
  StatefulProcessor surface (typed state handles, timers, TTL; needs
  the RocksDB state store provider AND the ``protobuf`` package, which
  this container lacks — the variant import-gates and its test skips
  when protobuf is absent).

Ordering: within a micro-batch rows are sorted by (ts, id); across
batches the processor assumes per-key monotone arrival (pair with a
watermark + sorted replay upstream when sources can be late — the
same caveat every change-data-capture consumer carries).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, state string, eff_from_ms long, eff_to_ms long, version long"
)
_STATE_SCHEMA = "state string, since_ms long, version long"


def _advance(cur, pdf: pd.DataFrame, key: int):
    """Walk a sorted batch from the current open interval; returns the
    new open interval and the list of closed-interval rows."""
    cur_state, cur_since, cur_version = cur
    closed = []
    for state, ts_ms in zip(pdf["state"], pdf["ts_ms"]):
        if cur_state is None:
            cur_state, cur_since, cur_version = state, int(ts_ms), 1
        elif state != cur_state:
            closed.append((key, cur_state, cur_since, int(ts_ms), cur_version))
            cur_state, cur_since = state, int(ts_ms)
            cur_version += 1
    return (cur_state, cur_since, cur_version), closed


def _prep(
    events: DataFrame, key_col: str, state_col: str, ts_col: str, id_col: str
) -> DataFrame:
    return events.select(
        F.col(key_col).cast("long").alias("user_id"),
        F.col(state_col).alias("state"),
        F.unix_millis(F.col(ts_col)).alias("ts_ms"),
        F.col(id_col).cast("long").alias("event_id"),
    )


def scd2_stream(
    events: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Append stream of CLOSED SCD2 intervals from a change-event
    stream; the open interval persists in keyed state until closed."""

    def track(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        cur = tuple(state.get) if state.exists else (None, None, 0)
        pdf = pd.concat(list(pdfs)).sort_values(["ts_ms", "event_id"])
        cur, closed = _advance(cur, pdf, int(key[0]))
        state.update(cur)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "state", "eff_from_ms", "eff_to_ms", "version"],
            )

    return _prep(events, key_col, state_col, ts_col, id_col).groupBy(
        "user_id"
    ).applyInPandasWithState(
        track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def scd2_stream_tws(
    events: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Same contract on the Spark 4 ``transformWithStateInPandas``
    surface. Raises ImportError where protobuf is unavailable."""
    import google.protobuf  # noqa: F401 — the API's wire format
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SCD2Processor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._open = handle.getValueState("open_interval", _STATE_SCHEMA)

        def handleInputRows(
            self, key, rows: Iterator[pd.DataFrame], timerValues
        ) -> Iterator[pd.DataFrame]:
            cur = (
                tuple(self._open.get()) if self._open.exists() else (None, None, 0)
            )
            pdf = pd.concat(list(rows)).sort_values(["ts_ms", "event_id"])
            cur, closed = _advance(cur, pdf, int(key[0]))
            self._open.update(cur)
            if closed:
                yield pd.DataFrame(
                    closed,
                    columns=[
                        "user_id", "state", "eff_from_ms", "eff_to_ms", "version",
                    ],
                )

        def close(self) -> None:
            pass

    return _prep(events, key_col, state_col, ts_col, id_col).groupBy(
        "user_id"
    ).transformWithStateInPandas(
        statefulProcessor=SCD2Processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
