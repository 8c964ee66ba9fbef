"""Driver-contract shape tests: __spark_entry__ must expose
entry/queries/oracle_sql in exactly the shape the grading driver
consumes (TESTDATA.md / SURVEY §5.2)."""

from __future__ import annotations

import importlib.util
import os

from pyspark.sql import DataFrame

_ENTRY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py"
)


def _load():
    spec = importlib.util.spec_from_file_location("__spark_entry__", _ENTRY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_contract_shape(spark):
    mod = _load()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert isinstance(qs, dict) and len(qs) >= 70
    assert isinstance(oracles, dict)
    # every oracle belongs to a registered query
    assert set(oracles) <= set(qs)
    # the vast majority must be exact-checked
    assert len(oracles) >= len(qs) - 5
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in oracles.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_entry_returns_rows(spark, sf_dir):
    mod = _load()
    df = mod.entry(spark)
    assert isinstance(df, DataFrame)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) > 0
