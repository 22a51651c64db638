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
