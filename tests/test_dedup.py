

def test_mh_shared_oracle_equals_registered(sf_dir):
    """The soak's factored MinHash oracle (shared sh/sig/bands temp
    tables, one pipeline build serving both minhash entries — the PQ
    move of VERDICT r9 item 8, extended r11) must be value-identical to
    the registered self-contained oracles: this pin licenses
    SOAK_r11's identical-coverage claim for the minhash family."""
    import duckdb

    from squirtle_spark import dialect as dl
    from squirtle_spark.catalog import TABLES
    from squirtle_spark.operators import dedup as D
    from squirtle_spark.oracle import _normalize

    con = duckdb.connect()
    try:
        for t in TABLES:
            con.sql(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        setup, shared = D.mh_shared_oracle(dl.DUCK)
        for s in setup:
            con.sql(s)
        full = {
            "dedup_minhash_lsh": D._minhash_lsh(dl.DUCK),
            "dedup_incremental_minhash": D._dedup_incremental_minhash(dl.DUCK),
        }
        for name, shared_q in shared.items():
            a, b = con.sql(shared_q).df(), con.sql(full[name]).df()
            assert len(a) == len(b) > 0, name
            assert _normalize(a) == _normalize(b), name
    finally:
        con.close()
