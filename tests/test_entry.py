"""The driver contract itself: entry() smoke + registry wiring invariants."""

import importlib.util


def _load():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_rows(spark):
    mod = _load()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["l_orderkey", "revenue", "o_orderdate", "o_orderpriority"]


def test_queries_and_oracles_align(spark):
    mod = _load()
    qs, os_ = mod.queries(), mod.oracle_sql()
    assert len(qs) >= 50
    assert set(os_) <= set(qs)
    # every oracle is self-contained DuckDB SQL (derived views inlined)
    for name, sql in os_.items():
        assert "SELECT" in sql.upper(), name
