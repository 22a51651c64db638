"""Skyline (Pareto-front) operator.

Multi-criteria filtering: keep the rows not *dominated* by any other row,
where q dominates p iff q is >= p on every metric and > on at least one
(both metrics maximized). The classic use in a curation pipeline is
picking the quality/recency or quality/diversity frontier of a candidate
pool instead of a single weighted score.

Scale design (2-D case implemented here):
- The naive formulation is a quadratic NOT EXISTS self-join. For two
  metrics the skyline collapses to **one window pass**: sort by metric
  x; a row survives iff its y strictly exceeds every y seen at strictly
  greater x, and it carries its x-group's max y. Both are window
  aggregates — ``max(y) over (order by x range between 1 following and
  unbounded following)`` (exact "strictly greater x" frame for integer
  metrics) and ``max(y) over (partition by x)``. One shuffle, no join,
  no quadratic term; a 10^9-row input costs a sort.
- For d > 2 metrics the standard distributed shape is local-skyline per
  partition (``mapInPandas``) followed by a global skyline of the union
  of local fronts — the front is tiny relative to the input, so the
  final pass is driver-scale. The 2-D window form is strictly better
  when it applies and is what the registry entry exercises.

Ties: rows with identical (x, y) on the front are all kept — dominance
requires strict improvement on at least one metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Rows on the maximization Pareto front of integer metrics (x, y).

    Both metric columns must be integral (the strictly-greater-x window
    frame is expressed as ``range between 1 following and unbounded
    following``, exact only for integer x). Returns the input rows that
    survive, unchanged.
    """
    x, y = F.col(x_col), F.col(y_col)
    w_strict = (
        Window.orderBy(x.cast("long"))
        .rangeBetween(1, Window.unboundedFollowing)
    )
    w_group = Window.partitionBy(x_col)
    m_strict = F.max(y).over(w_strict)
    m_group = F.max(y).over(w_group)
    return (
        df.withColumn("_m_strict", m_strict)
        .withColumn("_m_group", m_group)
        .filter(
            (F.col("_m_strict").isNull() | (F.col("_m_strict") < y))
            & (y == F.col("_m_group"))
        )
        .drop("_m_strict", "_m_group")
    )
