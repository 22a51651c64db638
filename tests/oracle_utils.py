"""Self-check harness mirroring the driver's DuckDB-oracle comparison:
row count + schema + order-insensitive value comparison after sorting
columns by name."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from postgis_gtfs_importer_spark.sources.tables import TESTDATA_TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "\x00NULL"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            return repr(v)
        if isinstance(v, bool):
            return str(int(v))
        return str(v)

    for c in df.columns:
        df[c] = df[c].map(norm)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(spark_df, oracle_df: pd.DataFrame) -> list[str]:
    """Return list of mismatch descriptions ([] == match)."""
    sp = spark_df.toPandas()
    problems = []
    if sorted(sp.columns) != sorted(oracle_df.columns):
        problems.append(f"columns: spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}")
        return problems
    if len(sp) != len(oracle_df):
        problems.append(f"rowcount: spark={len(sp)} oracle={len(oracle_df)}")
    # The driver hashes the *string form* of values, so an int64 column on
    # one side vs float64 on the other ("99111" vs "99111.0") hash-diverges
    # even when every value is numerically equal. _canon() below collapses
    # integral floats, which would mask exactly that — so flag kind drift
    # (int vs float) explicitly here. Root cause seen in round 1: DuckDB
    # sum(BIGINT) returns HUGEINT -> pandas float64; oracles must
    # CAST(sum(...) AS BIGINT).
    for c in sorted(sp.columns):
        a_kind = sp[c].dtype.kind
        b_kind = oracle_df[c].dtype.kind
        if {a_kind, b_kind} == {"i", "f"} or {a_kind, b_kind} == {"u", "f"}:
            problems.append(
                f"dtype kind drift on {c!r}: spark={sp[c].dtype} oracle={oracle_df[c].dtype}"
                " (driver hash would diverge; cast the oracle side)"
            )
    a, b = _canon(sp), _canon(oracle_df)
    if len(a) == len(b):
        neq = (a != b).any(axis=1)
        if neq.any():
            idx = neq[neq].index[:5]
            for i in idx:
                problems.append(f"row {i}: spark={a.loc[i].to_dict()} oracle={b.loc[i].to_dict()}")
    elif not problems:
        problems.append("length mismatch after canon")
    return problems
