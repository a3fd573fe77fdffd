"""Local replica of the driver's correctness gate: run a Spark query and its
DuckDB oracle SQL side-by-side, compare row count, column names, and
order-insensitive values (exact for non-floats; exact for floats too — the
queries are built so float values are bit-identical across engines)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TPCH = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TPCH:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical cell text: repr floats at full precision, normalize timestamps
    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return str(v)

    out = df.apply(lambda col: col.map(cell))
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def compare(spark_df, oracle_sql: str, con) -> list[str]:
    """Return list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    sp = spark_df.toPandas()
    du = con.execute(oracle_sql).df()
    if sorted(sp.columns) != sorted(du.columns):
        problems.append(f"columns differ: spark={sorted(sp.columns)} duck={sorted(du.columns)}")
        return problems
    if len(sp) != len(du):
        problems.append(f"row count differs: spark={len(sp)} duck={len(du)}")
    a, b = _canon(sp), _canon(du)
    if len(sp) == len(du) and not a.equals(b):
        neq = (a != b).any(axis=1)
        idx = list(a.index[neq])[:5]
        for i in idx:
            problems.append(f"row {i}: spark={a.loc[i].to_dict()} duck={b.loc[i].to_dict()}")
    return problems
