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


def hilbert_index(x: Column, y: Column, bits: int = 8) -> Column:
    """Hilbert-curve index of a quantized 2-D point — exact integers.

    Same contract as interleave_bits (inputs masked to [0, 2^bits)),
    better locality: consecutive Hilbert indices are always
    grid-adjacent (Manhattan distance 1), so range-partitioned files
    cover connected regions with no Morton "seam jumps" — tighter
    per-file min/max boxes, better pruning for the same file count.
    The classic xy2d quadrant-rotation recurrence, unrolled over
    ``bits`` levels as pure column arithmetic (CASE + shifts — the
    (3*rx)^ry Gray step is expressed as ``rx==1 ? 3-ry : ry`` to stay
    xor-free and engine-portable).

    The single-Column form nests each level's (hx, hy) inside the next,
    so the expression tree grows ~3^bits — fine to ``bits<=6``, a
    JVM-heap bomb beyond. For larger orders use
    :func:`with_hilbert_index`, which materializes each level as named
    columns (linear tree size).
    """
    if bits > 6:
        raise ValueError(
            "hilbert_index as a single Column nests ~3^bits expression "
            "nodes; use with_hilbert_index(df, ...) for bits > 6"
        )
    n_mask = (1 << bits) - 1
    hx = x.cast("long").bitwiseAND(F.lit(n_mask))
    hy = y.cast("long").bitwiseAND(F.lit(n_mask))
    d = F.lit(0).cast("long")
    for k in range(bits - 1, -1, -1):
        rx = F.shiftright(hx, k).bitwiseAND(F.lit(1))
        ry = F.shiftright(hy, k).bitwiseAND(F.lit(1))
        step = F.when(rx == 1, F.lit(3) - ry).otherwise(ry)
        d = d + step * F.lit(1 << (2 * k))
        flip_x = F.when(rx == 1, F.lit(n_mask) - hy).otherwise(hy)
        flip_y = F.when(rx == 1, F.lit(n_mask) - hx).otherwise(hx)
        new_hx = F.when(ry == 0, flip_x).otherwise(hx)
        new_hy = F.when(ry == 0, flip_y).otherwise(hy)
        hx, hy = new_hx, new_hy
    return d


def hilbert_index_sql(
    x_sql: str, y_sql: str, bits: int = 8
) -> tuple[str, str]:
    """DuckDB twin of hilbert_index: the same unrolled recurrence as a
    chain of CTE steps. Returns ``(cte_chain, final_cte_name)``; the
    chain reads from a CTE named ``__base`` that must expose the
    quantized dims (any other __base columns are carried through), and
    the final CTE exposes them plus the index column ``hd``.
    """
    n_mask = (1 << bits) - 1
    steps = []
    prev = "__h0"
    init = (
        f"__h0 AS (SELECT *, (CAST({x_sql} AS BIGINT) & {n_mask}) AS hx,"
        f" (CAST({y_sql} AS BIGINT) & {n_mask}) AS hy,"
        f" CAST(0 AS BIGINT) AS hd FROM __base)"
    )
    steps.append(init)
    for idx, k in enumerate(range(bits - 1, -1, -1), start=1):
        rx = f"((hx >> {k}) & 1)"
        ry = f"((hy >> {k}) & 1)"
        step = f"(CASE WHEN {rx} = 1 THEN 3 - {ry} ELSE {ry} END)"
        nxt = f"__h{idx}"
        steps.append(
            f"{nxt} AS (SELECT * REPLACE ("
            f"hd + {step} * {1 << (2 * k)} AS hd, "
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {n_mask} - hy"
            f" ELSE hy END) ELSE hx END AS hx, "
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {n_mask} - hx"
            f" ELSE hx END) ELSE hy END AS hy"
            f") FROM {prev})"
        )
        prev = nxt
    return ",\n".join(steps), prev


def with_hilbert_index(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    out_col: str = "hd",
) -> DataFrame:
    """hilbert_index for real orders (bits up to 31): one projection per
    level, each referencing the previous level's NAMED (hx, hy, hd)
    columns — tree size linear in ``bits`` instead of ~3^bits.
    Catalyst's CollapseProject declines to merge the chain because each
    intermediate is referenced multiple times by non-cheap expressions,
    so neither analysis nor optimization re-inflates the tree; runtime
    is the same whole-stage-codegen arithmetic either way.
    """
    if 2 * bits >= 63:
        raise ValueError(f"2 * bits = {2 * bits} overflows BIGINT")
    n_mask = (1 << bits) - 1
    carry = [c for c in df.columns if c not in ("_hx", "_hy", out_col)]
    cur = df.select(
        *carry,
        F.col(x_col).cast("long").bitwiseAND(F.lit(n_mask)).alias("_hx"),
        F.col(y_col).cast("long").bitwiseAND(F.lit(n_mask)).alias("_hy"),
        F.lit(0).cast("long").alias(out_col),
    )
    for k in range(bits - 1, -1, -1):
        rx = F.shiftright(F.col("_hx"), k).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col("_hy"), k).bitwiseAND(F.lit(1))
        step = F.when(rx == 1, F.lit(3) - ry).otherwise(ry)
        cur = cur.select(
            *carry,
            F.when(
                ry == 0,
                F.when(rx == 1, F.lit(n_mask) - F.col("_hy")).otherwise(
                    F.col("_hy")
                ),
            )
            .otherwise(F.col("_hx"))
            .alias("_hx"),
            F.when(
                ry == 0,
                F.when(rx == 1, F.lit(n_mask) - F.col("_hx")).otherwise(
                    F.col("_hx")
                ),
            )
            .otherwise(F.col("_hy"))
            .alias("_hy"),
            (F.col(out_col) + step * F.lit(1 << (2 * k))).alias(out_col),
        )
    return cur.drop("_hx", "_hy")


def compaction_plan(
    files: DataFrame,
    id_col: str = "path",
    size_col: str = "size_bytes",
    target_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Small-files compaction planner: assign every file to a rewrite
    bin of ~``target_bytes`` — the table-maintenance primitive every
    lakehouse compactor (Delta OPTIMIZE, Iceberg rewrite_data_files)
    runs, and the 100 TB problem z-ordering leaves behind (a year of
    15-minute micro-batches is ~35k files per partition; scanning
    them costs a task each).

    Assignment is CUMULATIVE CHUNKING over a deterministic uniform
    order: files order by (md5-prefix of id, id) — a hash order, so
    (a) the plan is reproducible across runs/engines with no
    tie-break ambiguity, and (b) the two-phase distributed prefix sum
    underneath gets UNIFORM bucket loads by construction (ordering by
    size would put every same-sized file in one bucket's window —
    the single-task trap sweep.py exists to avoid). Then
    ``bin_id = (running - 1) div target`` — each bin fills to the
    first file that crosses the target, so a bin overshoots by less
    than one file; a file larger than ``target_bytes`` owns its bin
    range alone (the compactor copies it through or splits it — both
    policies read the same plan). Size-balance beyond that is not the
    goal: compaction wants FEW, FULL bins, not equal ones.

    Exactness: integer byte sums, integer division — the two-phase
    prefix sum is algebraically identical to the naive global-window
    form (associativity), which is what the oracle runs. No global
    single-task pass: phase 2's window sees #buckets rows, not files.

    Returns (id, size_bytes, running_bytes, bin_id) — group by bin_id
    to drive the rewrite jobs; ``max(bin_id) + 1`` is the output file
    count estimate.
    """
    from .sweep import running_prefix_sum

    key = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 12), 16, 10
    ).cast("long")
    # 12 hex digits -> [0, 2^48); ~4k buckets keeps phase 2's window
    # thousands-of-rows-sized while each bucket stays file-count/4k
    bucket_width = (1 << 48) // 4096
    out = running_prefix_sum(
        files.select(
            F.col(id_col).alias("_id"),
            F.col(size_col).cast("long").alias("_sz"),
            key.alias("_k"),
        ),
        t_col="_k",
        delta_col="_sz",
        bucket_width=bucket_width,
        extra_order=[F.col("_id")],
    )
    return out.select(
        F.col("_id").alias(id_col),
        F.col("_sz").alias(size_col),
        F.col("running").alias("running_bytes"),
        # greatest(.., 1): a run of zero-size files at the head would
        # otherwise evaluate (0 - 1) div target, where Spark's div
        # truncates toward zero (0) but DuckDB's // floors (-1) — the
        # one negative-operand case in an otherwise nonnegative plan
        F.expr(f"(greatest(running, 1L) - 1) div {int(target_bytes)}")
        .cast("long")
        .alias("bin_id"),
    )


def rendezvous_assign(
    df: DataFrame,
    shards: list[str],
    id_col: str = "path",
    salt: str = "hrw",
) -> DataFrame:
    """Rendezvous (highest-random-weight, Thaler & Ravishankar 1998)
    shard assignment: each key goes to the shard with the largest
    ``md5(salt:shard:key)`` weight — the distribution primitive behind
    consistent cache/shard routing, with the property modulo hashing
    lacks: adding or removing a shard moves ONLY the keys whose argmax
    changes (~1/(n+1) of them), and every moved key moves TO the new
    shard (growth) or FROM the dead one (shrink) — never between
    survivors. That invariant is what makes incremental resharding of
    a 100 TB layout a copy of one shard's worth of data instead of a
    full rewrite; it is pinned exactly in tests, not argued.

    The shard list is a PLAN-TIME literal (tens to thousands of
    shards): each row evaluates |shards| md5s map-side — no join, no
    shuffle, no state. For shard counts beyond plan-literal comfort,
    route through a broadcast join instead; the argmax semantics stay
    the same. Ties (2^-60 per shard pair per key) break toward the
    lexicographically largest shard name via the (weight, shard)
    struct max — deterministic in both engines.

    Returns the input plus ``shard``. Weights use the first 15 md5 hex
    digits as a BIGINT (the established uniform-key discipline), so
    assignment is reproducible across engines, sessions, and runs.
    """
    if not shards:
        raise ValueError("rendezvous_assign needs at least one shard")
    if len(set(shards)) != len(shards):
        raise ValueError("rendezvous_assign shard names must be unique")
    key = F.col(id_col).cast("string")
    candidates = F.array(
        *[
            F.struct(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit(f"{salt}:{s}:"), key
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                )
                .cast("long")
                .alias("w"),
                F.lit(s).alias("s"),
            )
            for s in shards
        ]
    )
    return df.withColumn("shard", F.array_max(candidates)["s"])
