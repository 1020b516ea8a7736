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
    ]
    e = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    s1, s2, s3 = funnel_user_steps(e, FUNNEL_STEPS)
    assert sorted(r.user_id for r in s1.collect()) == [1, 2, 3, 4]
    assert sorted(r.user_id for r in s2.collect()) == [1, 4]
    assert sorted(r.user_id for r in s3.collect()) == [1]


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
