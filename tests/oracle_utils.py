"""Oracle-comparison harness mirroring the driver's correctness gate:
run the Spark query and the DuckDB oracle on the same parquet tables,
sort columns by name, sort rows, and compare values exactly.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from lapidus_spark.sources.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    # The driver hashes STRINGIFIED values, so int 3 vs float 3.0
    # ("3" vs "3.0") is a hash mismatch even though Python == says
    # equal. Mirror that: numeric kind must match exactly. (DuckDB
    # sum() yields HUGEINT, which pandas widens to float64 — the
    # round-1 win_sessionize/ext_text_stats failure mode.)
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        if isinstance(a, float) != isinstance(b, float):
            return False
        if isinstance(a, bool) != isinstance(b, bool):
            return False
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact — driver hashes values
    if pd.isna(a) if not isinstance(a, (list, tuple)) else False:
        return (pd.isna(b) if not isinstance(b, (list, tuple)) else False) is True
    return a == b


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    """Returns a report dict; 'ok' True iff exact match."""
    sdf = _canon(spark_df.toPandas())
    odf = _canon(con.sql(sql).df())
    report = {
        "ok": False,
        "rows": (len(sdf), len(odf)),
        "cols": (list(sdf.columns), list(odf.columns)),
        "detail": "",
    }
    if list(sdf.columns) != list(odf.columns):
        report["detail"] = "column mismatch"
        return report
    if len(sdf) != len(odf):
        report["detail"] = "rowcount mismatch"
        return report
    for col in sdf.columns:
        sv, ov = sdf[col].tolist(), odf[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            same = _values_equal(a, b)
            if not same:
                report["detail"] = (
                    f"value mismatch col={col} row={i}: spark={a!r} ({type(a).__name__}) "
                    f"vs oracle={b!r} ({type(b).__name__})"
                )
                return report
    report["ok"] = True
    return report
