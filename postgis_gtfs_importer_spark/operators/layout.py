"""Data-layout operators: Z-order (Morton) clustering for multi-dim scan
pruning.

At 100 TB the cheapest query is the one that never reads the file:
parquet row-group/file min-max statistics prune single-column ranges for
free, but a table sorted on ``x`` gives no locality on ``y``. Z-ordering
interleaves the bits of several quantized dimensions into one sort key,
so files cover tight hyper-rectangles and a predicate on ANY prefix-mix
of the dimensions skips most files (the Delta/Iceberg OPTIMIZE ZORDER
idea, public since the 1966 Morton report).

Everything here is exact integer arithmetic (shifts, masks, ors) —
cross-engine deterministic, so the driver's DuckDB oracle replays the
z-values bit-for-bit. The layout itself (`zorder_layout`) is
``repartitionByRange`` + ``sortWithinPartitions`` on the z-value: range
boundaries come from Spark's reservoir sampling, which is the right tool
for balanced files but is NOT deterministic — the oracle-checked surface
is the z-value math and the bucket histogram; the pruning effect is
pinned by tests/test_layout.py against real parquet scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: list[Column], bits: int = 16) -> Column:
    """Morton z-value: interleave the low ``bits`` bits of each column.

    Dimension j's bit i lands at output position ``i * n_dims + j`` —
    exact shifts/masks/ors, identical in Spark and DuckDB. Total output
    bits = bits * n_dims must stay < 63 (signed BIGINT).

    Inputs are masked to the low ``bits`` bits FIRST (two's-complement
    AND, identical in both engines): quantization to [0, 2^bits) is
    still the caller's job — out-of-range values alias into the domain
    rather than erroring — but the aliasing is now the explicit,
    engine-identical ``v & (2^bits - 1)``, never a sign-extended shift
    leaking high bits into non-local z-values that silently defeat
    pruning.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("z-order needs >= 2 dimensions")
    if bits * n >= 63:
        raise ValueError(f"bits * n_dims = {bits * n} overflows BIGINT")
    mask = (1 << bits) - 1
    out = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        cl = c.cast("long").bitwiseAND(F.lit(mask))
        for i in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(
                    F.shiftright(cl, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    return out


def interleave_bits_sql(col_sqls: list[str], bits: int = 16) -> str:
    """The DuckDB twin of interleave_bits — same mask, shifts, positions."""
    n = len(col_sqls)
    mask = (1 << bits) - 1
    terms = []
    for j, c in enumerate(col_sqls):
        for i in range(bits):
            terms.append(
                f"((((CAST({c} AS BIGINT) & {mask}) >> {i}) & 1) << {i * n + j})"
            )
    return "(" + " | ".join(terms) + ")"


def zorder_layout(
    df: DataFrame,
    dim_cols: list[str],
    bits: int = 16,
    n_files: int = 64,
    zval_col: str = "_zval",
) -> DataFrame:
    """Cluster a table for multi-dim pruning: compute the z-value, range-
    partition on it (each partition -> one tight z-interval -> one file
    at write time), and sort within partitions so row groups inside each
    file are tight too. Write the result with ``.write.parquet`` and
    min-max stats do the pruning on every dimension at once.

    Dimensions must already be quantized to [0, 2^bits) longs — callers
    own the quantization because it is domain knowledge (lat/lon grid,
    id buckets, time epochs). The shuffle is one range exchange over
    (zval) — the same cost as any global sort, paid once at layout time
    to make every later scan cheaper.
    """
    z = interleave_bits([F.col(c) for c in dim_cols], bits)
    return (
        df.withColumn(zval_col, z)
        .repartitionByRange(n_files, F.col(zval_col))
        .sortWithinPartitions(zval_col)
    )
