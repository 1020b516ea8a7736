"""Driver-contract regression tests: entry/queries/oracle_sql must work with a
session that has NONE of our factory configs (the driver supplies its own)."""

import importlib.util


def _load_entry():
    spec = importlib.util.spec_from_file_location("entry_mod", "/root/repo/__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_contract_shape():
    m = _load_entry()
    qs = m.queries()
    osql = m.oracle_sql()
    assert len(qs) >= 50
    assert set(osql) <= set(qs)  # every oracle key has a query
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in osql.values())
    # the driver's correctness gate checks the FIRST 50 registered queries:
    # every one of them must be oracle-backed, rows-only entries last — a
    # reorder that rotates an oracle query out of the checked prefix is a
    # silent coverage loss (round-3 verdict item 2/3)
    first_50 = list(qs)[:50]
    assert all(name in osql for name in first_50)


def test_entry_runs(spark):
    m = _load_entry()
    df = m.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["l_orderkey", "revenue", "o_orderdate", "o_orderpriority"]


def test_events_queries_survive_missing_nanos_conf(spark):
    """load_table must (re)set nanosAsLong itself — the driver's session won't
    have it and events.parquet carries INT64 TIMESTAMP(NANOS)."""
    m = _load_entry()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    try:
        n = m.queries()["tumbling_window_events"](spark, "/root/testdata/sf0.001").count()
        assert n > 0
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
