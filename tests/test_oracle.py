"""The correctness gate, locally: every registry query vs its DuckDB oracle.

Mirrors the reference's per-query semantic tests
(flock/src/datasource/nexmark/queries/*.rs run the LocalLauncher path and
assert batch contents; here the assertion is equality with an independent
engine instead of golden strings).
"""

import pytest

from squirtle_spark.oracle import check_query
from squirtle_spark.registry import load_all

ALL = sorted(load_all())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, sf_dir, name):
    res = check_query(spark, name, sf_dir)
    assert res.ok, res.message()
    assert res.rows_spark >= 0
