"""Local replica of the driver's correctness gate.

Runs a registered query on Spark and its oracle on DuckDB over the
same parquet fixtures, then compares row count, column names, and
values. The driver's value hash is order-insensitive but otherwise
exact, so this harness asserts EXACT equality (after sorting columns
by name and rows by value) — if a query passes here, any reasonable
hash of the same data matches.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from gostream_spark.io import TABLES, table_path


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # Stringify everything the way a hash would see it; normalize float repr.
    for c in df.columns:
        df[c] = df[c].map(_canon_value)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _canon_value(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>"
        # repr(float(v)): shortest round-trip repr, normalized through
        # the builtin so numpy.float64 (NumPy >= 2 reprs as
        # 'np.float64(0.5)') compares exact against Spark's plain float.
        return repr(float(v))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def compare(spark_df, oracle: str, sf_dir: str) -> None:
    """Assert the Spark result and the DuckDB oracle agree exactly."""
    got = _canon(spark_df.toPandas())
    want = _canon(run_oracle(oracle, sf_dir))
    assert list(got.columns) == list(want.columns), (
        f"schema mismatch: spark={list(got.columns)} duckdb={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count mismatch: spark={len(got)} duckdb={len(want)}"
    if not got.equals(want):
        diff_mask = (got != want).any(axis=1)
        sample = pd.concat(
            [got[diff_mask].head(5).add_prefix("spark_"),
             want[diff_mask].head(5).add_prefix("duck_")],
            axis=1,
        )
        raise AssertionError(f"value mismatch ({int(diff_mask.sum())} rows differ):\n{sample}")
