"""Arbitrary stateful streaming via the transformWithState API
(Spark 4.x, SPARK-45939) — the successor to applyInPandasWithState.

Where applyInPandasWithState hands the operator ONE opaque state blob,
transformWithState gives named, independently-evolvable state variables
(value/list/map state, TTL per variable, timers) managed by the state
store — the operator model long-running jobs need: state schema can
grow without checkpoint-breaking rewrites, and per-variable TTL bounds
store size without hand-rolled expiry logic.

``RunningTotalsProcessor`` is the canonical shape: per-key running
aggregates maintained incrementally across micro-batches. State per key
is O(1) (two BIGINTs), emissions are one row per key per batch it
appears in, and the cumulative counters are monotone — which is what
lets a consumer reduce the update-mode emission log to the final
snapshot with one max(struct(...)) per key. At scale the state
store shards by the grouping key like any stateful operator; a
1000-executor cluster holds billions of keys at 16 bytes each.

Reference scope: the reference is a periodic batch job (README.md:3);
this is the continuous-ingest extension of its stats surface, same as
streaming/events.py.

ENVIRONMENT GATE: transformWithStateInPandas speaks a protobuf-based
protocol to the JVM state server, so it requires the ``google.protobuf``
package at RUNTIME (the query itself fails with
STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE otherwise — measured in
this container, where protobuf is not installed). ``tws_available()``
probes for it; tests skip with the probe evidence when absent, the same
recorded-evidence pattern as the postgis gate in tests/test_pg_live.py.
The applyInPandasWithState sessionizer (streaming/events.py) covers the
stateful-streaming surface on protobuf-free environments.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import LongType, StructField, StructType

TOTALS_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_cents", LongType()),
    ]
)

_TOTALS_STATE_SCHEMA = StructType(
    [
        StructField("cnt", LongType()),
        StructField("cents", LongType()),
    ]
)


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user running (event count, exact-cents value sum).

    The per-row quantization floor(value*100 + 0.5) happens UPSTREAM as
    a column expression (JVM-side); the processor only adds BIGINTs, so
    the running sum is order- and batching-independent — replaying the
    same rows in any micro-batch split yields identical totals.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _TOTALS_STATE_SCHEMA)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        add_cnt = 0
        add_cents = 0
        for batch in rows:
            add_cnt += int(len(batch))
            add_cents += int(batch["cents"].sum())
        if self._totals.exists():
            cur_cnt, cur_cents = self._totals.get()
        else:
            cur_cnt, cur_cents = 0, 0
        cnt, cents = cur_cnt + add_cnt, cur_cents + add_cents
        self._totals.update((cnt, cents))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_events": [cnt],
                "sum_cents": [cents],
            }
        )

    def close(self) -> None:
        pass


def running_totals_stream(events: DataFrame) -> DataFrame:
    """events (user_id, value, ...) -> update-mode stream of per-user
    cumulative (n_events, sum_cents) via transformWithState."""
    quantized = events.select(
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    return quantized.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=TOTALS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def final_totals(emissions: DataFrame) -> DataFrame:
    """Reduce the update-mode emission log to each key's final snapshot:
    the cumulative counters are monotone, so the max struct per key IS
    the last emission."""
    return (
        emissions.groupBy("user_id")
        .agg(
            F.max(F.struct("n_events", "sum_cents")).alias("m")
        )
        .select(
            "user_id",
            F.col("m.n_events").alias("n_events"),
            F.col("m.sum_cents").alias("sum_cents"),
        )
    )


def tws_available() -> tuple[bool, str]:
    """Probe the transformWithState runtime dependency (protobuf).

    Returns (available, evidence) — evidence is the import error text
    when unavailable, so gates record WHY, not just that they skipped.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True, "google.protobuf importable"
    except Exception as e:  # ImportError or a broken partial install
        return False, f"{type(e).__name__}: {e}"
