"""Single-pass table profiling (ANALYZE-style column statistics).

The reference's publish path relies on engine-maintained statistics
(PostgreSQL ANALYZE after load, gtfs-via-postgres index builds); a
Spark-native engine surfaces the same information as a first-class
operator: per-column row count, null count, exact distinct count, and
min/max — the inputs to join planning, file layout decisions, and data
quality monitoring.

Scale design: ONE scan. All columns' aggregates are computed in a single
``agg`` over the table — Spark plans multiple distinct aggregates with
one Expand + two-stage hash aggregation (rows multiply by the column
count map-side, never a second table read), which at 100 TB beats
per-column scans by the column count. The wide one-row result is then
melted to one row per column with ``stack`` — driver-scale, free.
Min/max are canonicalized to strings AFTER aggregation so one schema
fits every column type (dates/ints/strings; floats are profiled by
range only where string forms are engine-stable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile ``cols`` in one scan: returns one row per column with
    ``(col_name, n_rows, n_nulls, n_distinct, min_str, max_str)``.
    Distinct counts are exact (null excluded, SQL semantics); min/max
    are cast to string post-aggregation.
    """
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count("*").alias(f"__rows_{c}"),
            F.sum(col.isNull().cast("long")).alias(f"__nulls_{c}"),
            F.countDistinct(col).alias(f"__dist_{c}"),
            F.min(col).cast("string").alias(f"__min_{c}"),
            F.max(col).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __rows_{c}, __nulls_{c}, __dist_{c}, __min_{c}, __max_{c}"
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_rows, n_nulls, n_distinct, min_str, max_str)"
        )
    ).select(
        "col_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_str",
        "max_str",
    )
