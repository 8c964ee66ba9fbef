"""Every registered query with an oracle must match it exactly —
the local twin of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from gostream_spark.registry import all_queries
from tests.parity import compare

_QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_parity(spark, sf_dir, name):
    q = _QUERIES[name]
    df = q.fn(spark, sf_dir)
    if q.oracle is None:
        # rows-only check, mirroring the driver's weaker gate — but at
        # least demand a non-empty result (matches the driver's entry
        # smoke check).
        assert df.count() > 0
        assert len(df.columns) > 0
    else:
        compare(df, q.oracle, sf_dir)
