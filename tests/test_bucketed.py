"""Bucketed-table co-located joins: the pre-shuffled big-big join path.

Asserts the property the sink exists for — after bucketing both sides on the
join key, the join and follow-on aggregation plan with ZERO exchanges — plus
correctness of the joined rows against the unbucketed plan.
"""

import pytest
from pyspark.sql import functions as F


def _explain(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    from hdfs2cass_spark.sinks.bucketed import write_bucketed

    root = tmp_path_factory.mktemp("bucketed")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    write_bucketed(li, "bt_lineitem", str(root / "li"), "l_orderkey", 8)
    write_bucketed(
        od.withColumnRenamed("o_orderkey", "l_orderkey"),
        "bt_orders",
        str(root / "od"),
        "l_orderkey",
        8,
    )
    yield "bt_lineitem", "bt_orders"
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bt_orders")


def test_bucketed_join_has_zero_exchanges(spark, bucketed_tables):
    """The whole point: equi-join on the bucket key reads both sides
    co-located — no Exchange anywhere in the joined + aggregated plan."""
    t1, t2 = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # the bare join: ZERO exchanges, both scans read Bucketed: true
        j = spark.table(t1).join(spark.table(t2), "l_orderkey")
        p = _explain(j)
        assert "SortMergeJoin" in p
        assert "Exchange" not in p, p
        assert p.count("Bucketed: true") == 2
        # with a follow-on aggregate on a DIFFERENT key, the ONLY exchange is
        # the aggregate's own (on o_orderstatus) — the join side still rides
        # the buckets
        j2 = (
            spark.table(t1)
            .join(spark.table(t2), "l_orderkey")
            .groupBy("o_orderstatus")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        p2 = _explain(j2)
        assert p2.count("Exchange") == 1
        assert "hashpartitioning(o_orderstatus" in p2
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_aggregation_skips_exchange(spark, bucketed_tables):
    """groupBy on the bucket key rides the bucketing — no exchange before
    the aggregate."""
    t1, _ = bucketed_tables
    p = _explain(
        spark.table(t1).groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    )
    assert "Exchange" not in p, p


def test_bucketed_join_rows_match_unbucketed(spark, sf_dir, bucketed_tables):
    t1, t2 = bucketed_tables
    got = sorted(
        tuple(r)
        for r in spark.table(t1)
        .join(spark.table(t2), "l_orderkey")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(20,2)")).alias("qty"),
        )
        .collect()
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    want = sorted(
        tuple(r)
        for r in li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(20,2)")).alias("qty"),
        )
        .collect()
    )
    assert got == want


def test_salted_bucketing_splits_hot_key_and_matches_plain_join(
    spark, tmp_path_factory
):
    """The documented skew bound: AQE cannot split a hot BUCKET (no shuffle
    to split), so a skewed key needs salt-on-write. Asserts the salted +
    replicated pair (a) still joins with zero exchanges, (b) actually
    spreads the hot key across multiple (key, salt) classes, and (c) is
    row-equivalent to the plain unsalted join."""
    from hdfs2cass_spark.sinks.bucketed import (
        SALT_COL,
        join_salted,
        write_bucketed_replicated,
        write_bucketed_salted,
    )

    root = tmp_path_factory.mktemp("salted")
    # 30% of fact rows share ONE key — the hot-bucket shape
    fact = spark.range(40_000).select(
        F.when(F.col("id") % 10 < 3, F.lit(7))
        .otherwise(F.pmod(F.col("id"), 1000))
        .cast("long")
        .alias("k"),
        F.col("id").alias("row_id"),
        (F.col("id") % 97).alias("v"),
    )
    dim = spark.range(1000).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("dv")
    )
    write_bucketed_salted(
        fact, "bs_fact", str(root / "f"), "k", 8, salt_buckets=4, salt_from="row_id"
    )
    write_bucketed_replicated(
        dim, "bs_dim", str(root / "d"), "k", 8, salt_buckets=4
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = join_salted(spark, "bs_fact", "bs_dim", "k")
        p = _explain(j)
        assert "SortMergeJoin" in p
        assert "Exchange" not in p, p  # (a) still the zero-exchange plan
        assert p.count("Bucketed: true") == 2

        # (b) the hot key occupies several salt classes — the straggler is
        # split into independently-scheduled join tasks
        n_salts = (
            spark.table("bs_fact")
            .filter("k = 7")
            .select(SALT_COL)
            .distinct()
            .count()
        )
        assert n_salts >= 2, f"hot key landed in {n_salts} salt class(es)"

        # (c) row-equivalence with the plain join
        got = sorted(
            tuple(r)
            for r in j.groupBy("dv")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
            .collect()
        )
        want = sorted(
            tuple(r)
            for r in fact.join(dim, "k")
            .groupBy("dv")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
            .collect()
        )
        assert got == want
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bs_fact")
        spark.sql("DROP TABLE IF EXISTS bs_dim")


def test_bucketed_write_file_layout(spark, bucketed_tables):
    """Every bucket holds exactly its hash class: re-reading with the bucket
    metadata and filtering to one key touches one bucket's files (the
    planner exposes this as SelectedBucketsCount). autoBucketedScan is
    pinned off for the check — with it on, a filter-only scan has no
    operator needing the bucket distribution, so the planner marks the scan
    non-bucketed and silently loses the pruning."""
    t1, _ = bucketed_tables
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        df = spark.table(t1).filter(F.col("l_orderkey") == 1)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")


def test_undeclared_hot_key_triggers_skew_warning(spark, tmp_path):
    """An UNDECLARED hot key must be caught at write time — the failure mode
    write_bucketed_salted cannot guard against because nobody reached for
    it. One key carrying half the rows over 8 buckets is >4x the average
    bucket; uniform keys stay silent."""
    import warnings as _w

    from hdfs2cass_spark.sinks.bucketed import detect_hot_keys, write_bucketed

    hot = spark.range(0, 2000).select(
        F.when(F.col("id") < 1001, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    # cutoff is STRICT: 4x the 250-row average bucket = 1000; 1001 trips it
    found = detect_hot_keys(hot, "k", 8)
    assert [k for k, _ in found] == [7] and found[0][1] == 1001

    with pytest.warns(UserWarning, match="hot join key.*write_bucketed_salted"):
        write_bucketed(hot, "bt_hot_warn", str(tmp_path / "hw"), "k", 8)
    spark.sql("DROP TABLE IF EXISTS bt_hot_warn")

    with pytest.raises(ValueError, match="hot join key"):
        write_bucketed(
            hot, "bt_hot_raise", str(tmp_path / "hr"), "k", 8, on_skew="raise"
        )

    # uniform keys: no detection, no warning
    uni = spark.range(0, 2000).select(F.col("id").alias("k"), F.col("id").alias("v"))
    assert detect_hot_keys(uni, "k", 8) == []
    with _w.catch_warnings():
        _w.simplefilter("error")
        write_bucketed(uni, "bt_uni", str(tmp_path / "un"), "k", 8)
    spark.sql("DROP TABLE IF EXISTS bt_uni")


def test_detect_hot_keys_empty_frame(spark):
    from hdfs2cass_spark.sinks.bucketed import detect_hot_keys

    empty = spark.range(0).select(F.col("id").alias("k"))
    assert detect_hot_keys(empty, "k", 8) == []


def test_null_heavy_key_warns_with_the_filter_remedy(spark, tmp_path):
    """NULL never equi-joins, so a mostly-NULL bucket column must not trip
    the SALTED-WRITER warning (round-7 advice) — but all NULLs still hash
    into one oversized unsplittable bucket FILE, a scan-side straggler
    (round-8 review): the check reports it separately, naming the actual
    remedy (filter the NULLs before the write)."""
    from hdfs2cass_spark.sinks.bucketed import detect_hot_keys, write_bucketed

    mostly_null = spark.range(0, 2000).select(
        F.when(F.col("id") < 1500, F.lit(None)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    # the hot-key LIST contract: non-null keys only
    assert detect_hot_keys(mostly_null, "k", 8) == []
    hot, null_n = detect_hot_keys(mostly_null, "k", 8, return_null_count=True)
    assert hot == [] and null_n == 1500
    with pytest.warns(UserWarning, match="NULL 'k'.*filter the NULL keys"):
        write_bucketed(mostly_null, "bt_nulls", str(tmp_path / "nn"), "k", 8)
    spark.sql("DROP TABLE IF EXISTS bt_nulls")
    # a FEW nulls (under the cutoff) stay silent
    import warnings as _w

    few_null = spark.range(0, 2000).select(
        F.when(F.col("id") < 10, F.lit(None)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    with _w.catch_warnings():
        _w.simplefilter("error")
        write_bucketed(few_null, "bt_fewnulls", str(tmp_path / "fn"), "k", 8)
    spark.sql("DROP TABLE IF EXISTS bt_fewnulls")


def test_warn_mode_checks_written_table_not_upstream(spark, tmp_path):
    """on_skew='warn' (the default) must read the WRITTEN table's key
    column, never recompute the upstream — a silent 2x cost for expensive
    upstreams (round-7 advice). Pinned with a Python-UDF upstream whose
    invocations are counted: the write evaluates it once per row; the skew
    check must add ZERO further invocations."""
    from pyspark.sql.types import LongType

    from hdfs2cass_spark.sinks.bucketed import write_bucketed

    calls = spark.sparkContext.accumulator(0)

    def expensive(x):
        calls.add(1)
        return x

    f = F.udf(expensive, LongType())
    hot = spark.range(0, 400).select(
        F.when(F.col("id") < 201, F.lit(7)).otherwise(F.col("id")).alias("raw"),
        F.col("id").alias("v"),
    ).select(f("raw").alias("k"), "v")
    with pytest.warns(UserWarning, match="hot join key"):
        write_bucketed(hot, "bt_postcheck", str(tmp_path / "pc"), "k", 8)
    # the repartition+write evaluates the UDF once per row (maybe twice if
    # the planner re-evaluates across the exchange); the post-write check
    # reads parquet, so the count must not grow past the write's own reads
    assert calls.value <= 2 * 400
    spark.sql("DROP TABLE IF EXISTS bt_postcheck")
