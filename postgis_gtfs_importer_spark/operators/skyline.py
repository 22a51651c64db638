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
  metrics) and ``max(y) over (partition by x)``.
- The global window has NO partition key, so Spark funnels its input
  through one task. That is fine only when the input is already small;
  :func:`skyline_2d` therefore first computes a **local skyline per
  partition** (a narrow, shuffle-free ``mapInPandas`` pass — sort by x
  descending, keep rows whose y exceeds the running max), and runs the
  single-task window only over the UNION OF LOCAL FRONTS. A point on
  the global front is on its partition's front (dominance within a
  subset is weaker), so the prefilter is lossless; the fronts are
  O(sqrt(n)) in expectation for random data and never larger than the
  partition's distinct-x count, so the single-task tail sees
  partitions x front-size rows, not the corpus. This is the standard
  local-skyline + global-merge distributed shape, and the same
  ``mapInPandas`` local pass generalizes to d > 2 (where no window
  form exists).

Correctness of the prefilter does not depend on partition layout — any
partitioning yields a superset of the global front, and the global
window pass is exact.

Ties: rows with identical (x, y) on the front are all kept — dominance
requires strict improvement on at least one metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _local_front(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Per-partition Pareto prefilter: within each partition, drop rows
    dominated by another row of the SAME partition. Narrow (no shuffle);
    the output is a superset of the global front. Arrow-batched
    ``mapInPandas`` — sort by x desc then y desc, keep rows whose y
    strictly exceeds the running max (ties on x are resolved by the
    exact global pass that follows)."""
    schema = df.schema

    def part(batches):
        import pandas as pd

        rows = [b for b in batches]
        if not rows:
            return
        p = pd.concat(rows, ignore_index=True)
        p = p.sort_values([x_col, y_col], ascending=[False, False])
        # Exact per-partition Pareto staircase. The earlier
        # ``y >= cummax(y)`` keep condition retained every row TYING the
        # running max — on y-tie-heavy inputs (constant y: each larger-x
        # row dominates, front = max-x rows only) the prefilter kept
        # ~100% and re-opened the single-task funnel it exists to close.
        # Correct rule: keep a row iff y equals its x-group's max AND
        # strictly exceeds the best y of every strictly-greater-x group.
        gmax = p.groupby(x_col, sort=False)[y_col].transform("max")
        new_group = p[x_col].ne(p[x_col].shift())
        # Running max of PRIOR x-groups. For integer metrics this must
        # stay in integer arithmetic: a float64 NaN-sentinel series
        # (the original form) silently rounds above 2^53, so a genuine
        # front row with y one past a 2^53-scale prior could compare
        # equal and be dropped — the prefilter is supposed to be
        # lossless. pandas nullable Int64 keeps exact int64 compare
        # with pd.NA as the no-prior-group sentinel.
        gmax_first = gmax[new_group]
        if pd.api.types.is_integer_dtype(p[y_col].dtype):
            prior_per_group = gmax_first.astype("Int64").cummax().shift(1)
        else:
            prior_per_group = gmax_first.astype("float64").cummax().shift(1)
        grp_pos = new_group.cumsum().to_numpy() - 1
        prior = prior_per_group.reset_index(drop=True).iloc[grp_pos]
        prior.index = p.index
        keep = (p[y_col] == gmax) & (
            prior.isna() | (p[y_col] > prior).fillna(False)
        )
        yield p[keep]

    return df.mapInPandas(part, schema=schema)


def skyline_2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Rows on the maximization Pareto front of integer metrics (x, y).

    Both metric columns must be integral (the strictly-greater-x window
    frame is expressed as ``range between 1 following and unbounded
    following``, exact only for integer x). Returns the input rows that
    survive, unchanged.

    Two phases: a shuffle-free per-partition prefilter
    (:func:`_local_front`) shrinks the input to the union of local
    fronts, then the exact single-task window pass runs over that small
    remainder — so the unpartitioned ``Window.orderBy`` never sees the
    full input (see module docstring for why the prefilter is lossless).
    """
    df = _local_front(df, x_col, y_col)
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
