"""Line-level exact deduplication (C4-style) for training corpora.

The C4 / RefinedWeb pipelines deduplicate text *below* document
granularity: a line (or fixed-size token window) that occurs verbatim in
many documents is boilerplate (navigation chrome, license headers,
cookie banners) and is removed everywhere except its first occurrence,
while the surrounding document survives. This complements the
document-level exact/near dedup family (``operators/dedup.py`` — the
Spark re-expression of gtfsclean's redundancy-removal semantics,
/root/reference/import.sh:44-100) with the sub-document pass a 100 TB
corpus needs.

Scale design:
- Documents are segmented into lines **map-side** with higher-order
  array functions (``split`` → ``slice``/``transform`` → one
  ``posexplode``) — no Python, no shuffle, whole-stage codegen.
- "First occurrence" is computed as ``min(struct(doc_id, line_no))``
  **grouped by line** — a hash aggregation with map-side partial
  combine. A window (``row_number() over (partition by line)``) would
  funnel every copy of a hot boilerplate line through one task; the
  min-struct aggregate reduces each partition's copies to one row
  before the shuffle, so a line repeated 100M times costs one row per
  map task, not 100M rows in one reduce task.
- The join back to the exploded lines is keyed on the line text; hot
  keys there are handled by AQE skew-join splitting (the build side —
  distinct lines with their first-occurrence coordinate — is small per
  key by construction: exactly one row).
- Reassembly groups by document — the shuffle is corpus-lines-sized,
  the same order as the segmentation output; nothing is quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def segment_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_per_line: int = 12,
) -> DataFrame:
    """Explode documents into fixed-width token windows ("lines").

    Real corpora split on ``\\n``; the synthetic testdata corpus is
    single-line, so the line boundary is a fixed token width — the
    operator semantics (segment → global first-occurrence → reassemble)
    are identical. Returns ``(id, line_no, line)``.
    """
    k = int(tokens_per_line)
    if k <= 0:
        raise ValueError("tokens_per_line must be positive")
    # Split ONCE into a fixed internal alias; the integral-div ceil expr
    # then references only that alias, so a parser-hostile text_col name
    # can't break or redirect it (profile_columns injection class), and
    # the token array isn't computed a second time inside the expr.
    base = df.select(
        F.col(id_col).alias("_sl_id"),
        F.split(F.col(text_col), " ").alias("_sl_toks"),
    )
    # ceil(n / k) without float math: (n + k - 1) div k — `div` is
    # Spark's integral division, exact at any size (a float `/` then
    # cast is only exact while n + k - 1 <= 2^53).
    nlines = F.expr(f"(size(_sl_toks) + {k - 1}) div {k}").cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), nlines - F.lit(1)),
        lambda i: F.array_join(
            F.slice(F.col("_sl_toks"), i * F.lit(k) + F.lit(1), k), " "
        ),
    )
    return base.select(
        F.col("_sl_id").alias(id_col),
        F.posexplode(lines).alias("line_no", "line"),
    )


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_per_line: int = 12,
) -> DataFrame:
    """Remove every non-first occurrence of each distinct line corpus-wide.

    First occurrence = the lexicographically smallest ``(id, line_no)``
    pair over all copies of the line (deterministic, partition-order
    independent). Returns one row per input document:

    ``(id, n_lines, kept_lines, dropped_lines, kept_text)``

    where ``kept_text`` is the document reassembled from its surviving
    lines in original order (newline-joined).
    """
    from .dedup import materialize

    ldf = segment_lines(df, id_col, text_col, tokens_per_line)
    firsts = materialize(
        ldf.groupBy("line").agg(
            F.min(F.struct(F.col(id_col), F.col("line_no"))).alias("first_occ")
        )
    )
    # materialize() is LOAD-BEARING for skew here, not an optimization
    # nicety: AQE's OptimizeSkewedJoin only rewrites a sort-merge join
    # whose two children are Sort <- ShuffleQueryStage(ENSURE_REQUIREMENTS).
    # Without the checkpoint, the first-occurrence aggregate sits between
    # the exchange and the sort on the build side, the pattern doesn't
    # match, and every copy of the hottest boilerplate line funnels into
    # ONE unsplittable task (measured: no skew=true at any threshold; a
    # repartition() hint doesn't help either — its REPARTITION_BY_NUM
    # shuffle origin is likewise excluded). With it, the join re-shuffles
    # both sides naturally and the hot-line partition splits
    # (SortMergeJoin(skew=true), pinned by tests/test_scale_smoke.py).
    # Cost: one materialization of the distinct-lines relation, the same
    # order as the shuffle write the join pays anyway.
    joined = ldf.join(firsts, "line")
    kept = (F.col(id_col) == F.col("first_occ")[id_col]) & (
        F.col("line_no") == F.col("first_occ")["line_no"]
    )
    flagged = joined.select(
        F.col(id_col), "line_no", "line", kept.alias("kept")
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("kept").cast("long")).alias("kept_lines"),
            F.sum((~F.col("kept")).cast("long")).alias("dropped_lines"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("kept"), F.struct("line_no", "line"))
                        )
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("kept_text"),
        )
    )
