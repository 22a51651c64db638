"""Snapshot diff and merge-upsert — change tracking between imports.

The reference keeps several published snapshot databases side by side
(retention top-k, /root/reference/import.js:237-268) precisely so
consumers can compare feed versions; it never ships the comparison
itself. These operators close that gap: ``snapshot_diff`` classifies
every primary key across two snapshots as added/removed/changed/
unchanged, and ``merge_upsert`` is the Delta-style MERGE (source wins,
unmatched target survives) expressed as pure DataFrame ops.

Plan shape at 100 TB: both operators are a single full-outer/anti join
keyed on the primary key. Rows are reduced map-side to (pk, fingerprint)
— a fixed ~50 bytes/row — before the shuffle, so diffing two 100 TB
snapshots shuffles GBs, not TBs; the fingerprint is an md5 over the
compared columns with explicit null sentinels (cross-engine: DuckDB
``md5(concat_ws(chr(31), coalesce(CAST(c AS VARCHAR), chr(0)), ...))``).
With both snapshots staged bucketed on the pk (sinks/staging.py) the
join is co-located and the diff is shuffle-free.

Fingerprint caveat, enforced nowhere but documented loudly: columns
compared through CAST-to-string must have engine-stable string forms —
integers, strings, dates, decimals. Raw doubles/timestamps format
differently across engines; quantize them first (plans/queries.py::
fixed_point) if they must participate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Field / null sentinels for the fingerprint concat — ASCII unit
#: separator and NUL, neither plausible in data.
_SEP = "\x1f"
_NULL = "\x00"


def row_fingerprint(cols: list[str]) -> Column:
    """md5 over the given columns with null sentinels — the row identity
    used for change detection (same digest family as A4/A5,
    functions/digests.py)."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    pk_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Classify every pk across two snapshots:
    added / removed / changed / unchanged.

    One full-outer join on the pk over map-side-reduced
    (pk, fingerprint) rows.

    Returns (pk..., status).
    """
    # Pk equality is NULL-SAFE: a NULL pk component must match its NULL
    # twin across snapshots (plain `=` never matches NULL, so the same
    # NULL-pk row was classified added AND removed every diff — the
    # in-domain-NULL class the nulled-payload sweeps keep finding).
    o = old.select(
        *[F.col(k).alias(f"_o_{k}") for k in pk_cols],
        row_fingerprint(compare_cols).alias("_fp_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_n_{k}") for k in pk_cols],
        row_fingerprint(compare_cols).alias("_fp_new"),
    )
    cond = [
        F.col(f"_o_{k}").eqNullSafe(F.col(f"_n_{k}")) for k in pk_cols
    ]
    status = (
        F.when(F.col("_fp_old").isNull(), F.lit("added"))
        .when(F.col("_fp_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return o.join(n, cond, "full_outer").select(
        *[
            # equal whenever both sides exist (null-safe match), so
            # either side supplies the pk; coalesce handles the
            # one-sided added/removed rows. A genuinely NULL pk stays
            # NULL (coalesce of two NULLs) — faithful, not fabricated.
            F.when(F.col("_fp_old").isNotNull(), F.col(f"_o_{k}"))
            .otherwise(F.col(f"_n_{k}"))
            .alias(k)
            for k in pk_cols
        ],
        status.alias("status"),
    )


def merge_upsert(
    target: DataFrame, source: DataFrame, pk_cols: list[str]
) -> DataFrame:
    """MERGE: source rows win on pk match, unmatched target rows
    survive, source-only rows insert. Schemas must match by name.

    anti-join + union — two map-side-combinable stages, one shuffle on
    the pk (zero with bucketed staging). The idempotent re-import
    primitive for mutable feeds: applying the same source twice is a
    no-op. Pk matching is NULL-SAFE (a NULL-pk source row REPLACES the
    target's NULL-pk row rather than accumulating a duplicate on every
    re-apply — the idempotency contract under the in-domain-NULL class).
    """
    src = source.alias("_mu_s")
    tgt = target.alias("_mu_t")
    cond = [
        F.col(f"_mu_t.{k}").eqNullSafe(F.col(f"_mu_s.{k}")) for k in pk_cols
    ]
    keep = tgt.join(src, cond, "left_anti")
    return keep.unionByName(source)


def scd2_apply(
    history: DataFrame,
    source: DataFrame,
    pk_cols: list[str],
    compare_cols: list[str],
    batch_id: int,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) apply: fold a new snapshot into
    a versioned history table.

    ``history`` carries the payload (``pk_cols`` + ``compare_cols``) plus
    ``valid_from``/``valid_to`` batch stamps; ``valid_to IS NULL`` marks
    the current version. Applying ``source`` at ``batch_id``:

      * pk gone from source      -> current row closed (valid_to = batch)
      * payload changed          -> current row closed + new open version
      * unchanged                -> current row untouched
      * brand-new pk             -> new open version
      * already-closed rows      -> pass through untouched (never joined)

    The reference keeps whole-database snapshots side by side for exactly
    this history question (retention top-k, import.js:237-268) but ships
    no row-level versioning; this is that capability as an operator, and
    the temporal complement of ``snapshot_diff``/``merge_upsert``.

    Plan shape: ONE full-outer join on the pk between the CURRENT slice
    and the source — closed history (the bulk of a long-lived table: its
    row count grows with every batch, the current slice doesn't) is
    filtered out before the shuffle and unioned back untouched. Change
    classification compares md5 fingerprints computed map-side
    (row_fingerprint); each joined row then emits its 0-2 output versions
    through one array+explode, so the branch logic adds no second join
    and no second shuffle. Idempotent: re-applying the same source at the
    same batch_id reproduces the same history (closing and re-opening use
    equal stamps, and unchanged fingerprints short-circuit).
    """
    payload = [*pk_cols, *compare_cols]
    cur = history.filter(F.col(valid_to_col).isNull())
    closed = history.filter(F.col(valid_to_col).isNotNull())
    b = F.lit(int(batch_id)).cast("long")

    c = cur.select(
        *[F.col(k).alias(f"_c_{k}") for k in payload],
        F.col(valid_from_col).alias("_c_from"),
        row_fingerprint(compare_cols).alias("_fp_c"),
    )
    s = source.select(
        *[F.col(k).alias(f"_s_{k}") for k in payload],
        row_fingerprint(compare_cols).alias("_fp_s"),
    )
    # NULL-SAFE pk match: with plain `=` a NULL-pk row never joined its
    # own current version, so every batch closed it and opened a
    # duplicate — violating the idempotency contract documented above
    # (re-applying the same source must reproduce the same history).
    cond = [F.col(f"_c_{k}").eqNullSafe(F.col(f"_s_{k}")) for k in pk_cols]
    j = c.join(s, cond, "full_outer")

    def version(side: str, vfrom, vto) -> Column:
        return F.struct(
            *[F.col(f"_{side}_{k}").alias(k) for k in payload],
            vfrom.cast("long").alias(valid_from_col),
            vto.cast("long").alias(valid_to_col),
        )

    null_b = F.lit(None).cast("long")
    out = F.when(
        F.col("_fp_s").isNull(),  # deleted: close the current row
        F.array(version("c", F.col("_c_from"), b)),
    ).when(
        F.col("_fp_c").isNull(),  # brand-new pk: open a version
        F.array(version("s", b, null_b)),
    ).when(
        F.col("_fp_c") == F.col("_fp_s"),  # unchanged: keep current open
        F.array(version("c", F.col("_c_from"), null_b)),
    ).otherwise(  # changed: close old, open new
        F.array(
            version("c", F.col("_c_from"), b),
            version("s", b, null_b),
        )
    )
    applied = j.select(F.explode(out).alias("_v")).select("_v.*")
    return closed.select(
        *payload, F.col(valid_from_col).cast("long").alias(valid_from_col),
        F.col(valid_to_col).cast("long").alias(valid_to_col),
    ).unionByName(applied)
