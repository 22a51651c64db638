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
    o = old.select(*pk_cols, row_fingerprint(compare_cols).alias("_fp_old"))
    n = new.select(*pk_cols, row_fingerprint(compare_cols).alias("_fp_new"))
    status = (
        F.when(F.col("_fp_old").isNull(), F.lit("added"))
        .when(F.col("_fp_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return o.join(n, pk_cols, "full_outer").select(
        *pk_cols, status.alias("status")
    )


def merge_upsert(
    target: DataFrame, source: DataFrame, pk_cols: list[str]
) -> DataFrame:
    """MERGE: source rows win on pk match, unmatched target rows
    survive, source-only rows insert. Schemas must match by name.

    anti-join + union — two map-side-combinable stages, one shuffle on
    the pk (zero with bucketed staging). The idempotent re-import
    primitive for mutable feeds: applying the same source twice is a
    no-op.
    """
    keep = target.join(source, pk_cols, "left_anti")
    return keep.unionByName(source)
