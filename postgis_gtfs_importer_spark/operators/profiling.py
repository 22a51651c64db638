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
melted to one row per column with an array-of-structs explode built
from typed Column expressions (identifier-injection-proof) —
driver-scale, free.
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
    # Aliases are POSITIONAL (__rows_0, __rows_1, ...) and the melt is
    # built from typed Column expressions (array of structs + explode),
    # so a profiled column whose name contains spaces, quotes, hyphens
    # or any other SQL-hostile character never reaches a parsed
    # expression string — only F.col(), which takes names literally.
    aggs = []
    for i, c in enumerate(cols):
        col = df[c]
        aggs += [
            F.count("*").alias(f"__rows_{i}"),
            F.sum(col.isNull().cast("long")).alias(f"__nulls_{i}"),
            F.countDistinct(col).alias(f"__dist_{i}"),
            F.min(col).cast("string").alias(f"__min_{i}"),
            F.max(col).cast("string").alias(f"__max_{i}"),
        ]
    wide = df.agg(*aggs)
    melted = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"__rows_{i}").cast("long").alias("n_rows"),
                F.col(f"__nulls_{i}").cast("long").alias("n_nulls"),
                F.col(f"__dist_{i}").cast("long").alias("n_distinct"),
                F.col(f"__min_{i}").alias("min_str"),
                F.col(f"__max_{i}").alias("max_str"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return wide.select(F.explode(melted).alias("p")).select("p.*")
