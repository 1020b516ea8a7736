"""Ordered-funnel semantics (plans/eventfunnel.py): the differential oracle
proves cross-engine exactness; this proves the ORDER matters — a later-step
event that precedes the user's earlier step never counts."""

from __future__ import annotations

import datetime as dt

from hdfs2cass_spark.plans.eventfunnel import FUNNEL_STEPS, funnel_user_steps


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_funnel_is_strictly_ordered(spark):
    rows = [
        # user 1: view -> click -> purchase, in order: reaches every step
        (1, _ts(1), "view"), (1, _ts(2), "click"), (1, _ts(3), "purchase"),
        # user 2: click BEFORE the first view -> never reaches step 2
        (2, _ts(1), "click"), (2, _ts(2), "view"),
        # user 3: no click at all -> purchase cannot count
        (3, _ts(1), "view"), (3, _ts(2), "purchase"),
        # user 4: purchase between view and click -> reaches step 2 only
        (4, _ts(1), "view"), (4, _ts(2), "purchase"), (4, _ts(3), "click"),
        # NULL user: ignored entirely
        (None, _ts(1), "view"),
        # user 5: only a NULL-ts view — cannot form a journey, so step 1
        # must NOT count them (a t1=NULL user deflates every later rate)
        (5, None, "view"),
    ]
    e = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    s1, s2, s3 = funnel_user_steps(e, FUNNEL_STEPS)
    assert sorted(r.user_id for r in s1.collect()) == [1, 2, 3, 4]
    assert sorted(r.user_id for r in s2.collect()) == [1, 4]
    assert sorted(r.user_id for r in s3.collect()) == [1]


def test_cohort_retention_planted_gap(spark, tmp_path):
    """Two cohorts, one user skipping a week: the skipped week's offset
    simply has no row for them, offsets are week-granular, and offset 0 is
    the cohort size by construction."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    def us(day, hour=12):
        return (dt.datetime(2024, 1, day, hour) - dt.datetime(1970, 1, 1)).total_seconds() * 1e6

    # week boundaries: 2024-01-01 and 2024-01-08 and 2024-01-15 are Mondays
    rows = [
        # user 1, cohort w0: active w0, SKIPS w1, returns w2
        (1, us(2)), (1, us(16)),
        # user 2, cohort w0: active w0 and w1
        (2, us(3)), (2, us(9)),
        # user 3, cohort w1 only
        (3, us(10)),
        (None, us(2)),  # NULL user ignored
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([int(r[1]) for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = str(tmp_path / "ev")
    (tmp_path / "ev").mkdir()
    pq.write_table(t, f"{d}/events.parquet")
    from hdfs2cass_spark.plans import CATALOG

    out = {
        (str(r.cohort_week), r.week_offset): r
        for r in CATALOG["cohort_retention"].fn(spark, d).collect()
    }
    w0, w1 = "2024-01-01", "2024-01-08"
    assert out[(w0, 0)].n_active == 2 and out[(w0, 0)].retention == 1.0
    assert out[(w0, 1)].n_active == 1  # only user 2; user 1 skipped
    assert out[(w0, 2)].n_active == 1  # user 1 returns
    assert out[(w0, 1)].retention == 0.5
    assert out[(w1, 0)].n_active == 1  # user 3's own cohort
    assert (w1, 1) not in out  # nobody from cohort w1 active later


def test_funnel_steps_are_partition_invariant(spark, sf_dir):
    """The per-user step tables must not depend on physical partitioning
    (min() is order-insensitive; joins are keyed) — run the composable form
    at 1 and 7 input partitions."""
    from hdfs2cass_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    outs = []
    for n in (1, 7):
        steps = funnel_user_steps(e.repartition(n), FUNNEL_STEPS)
        outs.append([sorted(tuple(r) for r in s.collect()) for s in steps])
    assert outs[0] == outs[1]


def test_time_to_convert_matches_direct_computation(spark, sf_dir):
    """The histogram order statistics must equal a direct Python
    recomputation over the collected per-user durations."""
    import math

    from hdfs2cass_spark.plans import CATALOG
    from hdfs2cass_spark.sources.readers import load_table

    s1, _, s3 = funnel_user_steps(
        load_table(spark, sf_dir, "events"), FUNNEL_STEPS
    )
    durs = sorted(
        int((r.t3 - r.t1).total_seconds() * 1_000_000) // 60_000_000
        for r in s3.join(s1, "user_id").collect()
    )
    row = CATALOG["funnel_time_to_convert"].fn(spark, sf_dir).collect()[0]
    n = len(durs)
    lo, hi = math.floor((n + 1) / 2), math.ceil((n + 1) / 2)
    assert row.n_converted == n
    assert row.median_minutes == (durs[lo - 1] + durs[hi - 1]) / 2
    assert row.p90_minutes == durs[math.ceil(0.9 * n) - 1]
    assert row.max_minutes == durs[-1]
    assert row.avg_minutes == round(sum(durs) / n, 6)


def test_transition_matrix_planted_and_normalized(spark, tmp_path, sf_dir):
    """Planted sequence a->b->a->c gives exactly the expected transitions;
    on the fixture, each prev row's probabilities sum to 1."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hdfs2cass_spark.plans import CATALOG

    rows = [(1, i, ty) for i, ty in enumerate(["a", "b", "a", "c"])]
    t = pa.table(
        {
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array(
                [int(dt.datetime(2024, 1, 1, 0, r[1]).timestamp() * 1e6) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = str(tmp_path / "ev")
    (tmp_path / "ev").mkdir()
    pq.write_table(t, f"{d}/events.parquet")
    got = {
        (r.prev_type, r.next_type): (r.n, r.p_next)
        for r in CATALOG["event_transition_matrix"].fn(spark, d).collect()
    }
    assert got == {
        ("a", "b"): (1, 0.5),
        ("a", "c"): (1, 0.5),
        ("b", "a"): (1, 1.0),
    }

    sums = {}
    for r in CATALOG["event_transition_matrix"].fn(spark, sf_dir).collect():
        sums[r.prev_type] = sums.get(r.prev_type, 0.0) + r.p_next
    assert sums and all(abs(v - 1.0) < 1e-4 for v in sums.values())


def test_funnel_counts_tie_to_steps(spark, sf_dir):
    from hdfs2cass_spark.plans import CATALOG
    from hdfs2cass_spark.sources.readers import load_table

    rep = {r.step: r for r in CATALOG["event_funnel_conversion"].fn(spark, sf_dir).collect()}
    steps = funnel_user_steps(load_table(spark, sf_dir, "events"), FUNNEL_STEPS)
    for k, s in enumerate(steps, start=1):
        assert rep[k].n_users == s.count()
    # monotone: each step can only lose users
    assert rep[1].n_users >= rep[2].n_users >= rep[3].n_users
    assert rep[1].conversion_rate is None
