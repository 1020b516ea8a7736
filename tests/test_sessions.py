"""Planted-event semantics for the session-path and DAU/WAU rows
(plans/sessions.py): known journeys produce the exact expected paths,
truncation, ranking, and trailing-window counts — and the oracle SQL run in
DuckDB over the same planted events agrees with the Spark plan."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hdfs2cass_spark.plans.registry import CATALOG

US = 1_000_000
H = 3600 * US
DAY = 24 * H
BASE = 1_704_067_200 * US  # 2024-01-01T00:00Z (a Monday)

# (event_id, ts_us, user_id, event_type)
EVENTS = [
    # user 1, session 1: view > click > purchase (1-min spacing)
    (1, BASE, 1, "view"),
    (2, BASE + 60 * US, 1, "click"),
    (3, BASE + 120 * US, 1, "purchase"),
    # user 1, session 2 (2h later): view only
    (4, BASE + 2 * H, 1, "view"),
    # user 2, one session, same journey as user 1's first
    (5, BASE + DAY, 2, "view"),
    (6, BASE + DAY + 60 * US, 2, "click"),
    (7, BASE + DAY + 120 * US, 2, "purchase"),
    # user 3, one 7-event session: truncates to the first 5 types
    *[
        (8 + i, BASE + i * 60 * US, 3, t)
        for i, t in enumerate(
            ["view", "view", "click", "view", "click", "purchase", "view"]
        )
    ],
    # user 4 active on day 8 only (exercises the trailing WAU window)
    (20, BASE + 7 * DAY, 4, "view"),
    # NULL ts and NULL user: excluded by BOTH engines — Spark sorts NULLs
    # first, DuckDB last, so an unfiltered NULL ts would session and order
    # DIFFERENTLY per engine (the review finding the filter pins)
    (21, None, 1, "view"),
    (22, BASE + 5 * DAY, None, "click"),
]


@pytest.fixture(scope="module")
def events_sf(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sess_events")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in EVENTS], pa.int64()),
                "ts": pa.array([r[1] for r in EVENTS], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in EVENTS], pa.int64()),
                "event_type": pa.array([r[3] for r in EVENTS], pa.string()),
                "value": pa.array([1.0] * len(EVENTS), pa.float64()),
                "props": pa.array(["{}"] * len(EVENTS), pa.string()),
            }
        ),
        d / "events.parquet",
    )
    return str(d)


def test_session_paths_census_truncation_and_rank(spark, events_sf):
    rows = CATALOG["session_top_paths"].fn(spark, events_sf).collect()
    by_path = {r["path"]: r for r in rows}
    # two identical full journeys; 'view' also counts 2 and wins the
    # ascending-path tiebreak ('view' < 'view>...')
    assert by_path["view>click>purchase"]["n_sessions"] == 2
    assert by_path["view"]["rnk"] == 1
    assert by_path["view>click>purchase"]["rnk"] == 2
    # user 3's 7-event session truncates to its first 5 types
    assert "view>view>click>view>click" in by_path
    assert by_path["view>view>click>view>click"]["n_sessions"] == 1
    # user 1's second session + user 4's = two 'view' singleton sessions
    assert by_path["view"]["n_sessions"] == 2
    # 5 sessions total -> shares sum to 1
    assert sum(r["share"] for r in rows) == pytest.approx(1.0, abs=1e-5)
    # ties rank deterministically by path ascending
    n_to_paths = {}
    for r in rows:
        n_to_paths.setdefault(r["n_sessions"], []).append((r["rnk"], r["path"]))
    for grp in n_to_paths.values():
        assert grp == sorted(grp, key=lambda x: x[1])


def test_dau_wau_trailing_window(spark, events_sf):
    rows = {str(r["day"]): r for r in CATALOG["engagement_dau_wau"].fn(spark, events_sf).collect()}
    # day 1 (2024-01-01): users 1,3 -> DAU 2, WAU 2
    assert rows["2024-01-01"]["dau"] == 2 and rows["2024-01-01"]["wau"] == 2
    # day 2: user 2 -> DAU 1, trailing 7 days include day 1 -> WAU 3
    assert rows["2024-01-02"]["dau"] == 1 and rows["2024-01-02"]["wau"] == 3
    # day 8: user 4; trailing window [day2..day8] holds user 2 + 4 -> WAU 2
    assert rows["2024-01-08"]["dau"] == 1 and rows["2024-01-08"]["wau"] == 2
    assert rows["2024-01-08"]["stickiness"] == 0.5
    assert len(rows) == 3  # only ACTIVE days appear


def test_cross_engine_on_planted_events(spark, events_sf):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": [r[0] for r in EVENTS],
                "ts": pd.to_datetime(
                    [r[1] // US if r[1] is not None else None for r in EVENTS],
                    unit="s",
                ),
                "user_id": [r[2] for r in EVENTS],
                "event_type": [r[3] for r in EVENTS],
            }
        ),
    )
    for name in ("session_top_paths", "engagement_dau_wau"):
        want = con.execute(CATALOG[name].oracle).fetchdf()
        got = CATALOG[name].fn(spark, events_sf).toPandas()
        assert len(want) == len(got), name
        for col in want.columns:
            for w, g in zip(want[col].tolist(), got[col].tolist()):
                if isinstance(w, float):
                    assert g == pytest.approx(w), (name, col)
                elif col == "day":
                    # pandas renders DuckDB DATE as a midnight Timestamp
                    assert str(g)[:10] == str(w)[:10], (name, col, w, g)
                else:
                    assert str(g) == str(w), (name, col, w, g)


def test_top_paths_agg_input_is_rn_bounded(spark, events_sf):
    """The collect_list input must be row_number-filtered to PATH_STEPS
    BEFORE the groupBy — a bare collect_list over an unbounded bot session
    (one user, <30-min gaps forever) materializes every event in that
    group's agg buffer (the hot-group OOM at 100x; round-7 verdict item 2).
    The filter must appear below the aggregate in the executed plan, and the
    (user_id, session_no) window must NOT add a shuffle on top of
    sessionization's hash(user_id) exchange."""
    df = CATALOG["session_top_paths"].fn(spark, events_sf)
    df.collect()  # AQE finalizes (exchange reuse is a runtime decision)
    plan = df._jdf.queryExecution().executedPlan().toString()
    agg_pos = plan.find("collect_list")
    assert agg_pos != -1
    filt_pos = plan.find("rn", agg_pos)  # rn <= 5 filter BELOW the agg
    assert filt_pos != -1 and "<= 5" in plan[filt_pos : filt_pos + 40]
    # Catalyst pushes the rn<=5 into a WindowGroupLimit: each sort partition
    # truncates to 5 rows/session BEFORE the window materializes anything
    assert "WindowGroupLimit" in plan
    # hash(user_id) from sessionization already clusters (user_id,
    # session_no): the in-session window must re-sort in place, not shuffle
    assert ", session_no" not in plan.split("Exchange hashpartitioning", 1)[-1].split(")", 1)[0]
    # the share denominator rides an unbounded window over the POST-AGGREGATE
    # census (r13: the census.agg + crossJoin form re-ran the whole
    # scan+sessionize+census pipeline per action — exchange reuse only
    # deduped the events-scan shuffle, not the window pipeline above it).
    # One sessionize pipeline in the executed plan: exactly one
    # partial_collect_list (the path build runs once) and no
    # BroadcastNestedLoopJoin for the total.
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("partial_collect_list") == 1
    assert "BroadcastNestedLoopJoin" not in final


def test_top_paths_mega_session_bounded(spark, tmp_path):
    """A bot user emitting 200k events at 10-s gaps forms ONE session; the
    census must still answer (bounded agg state) and truncate its path to
    the first PATH_STEPS types."""
    n = 200_000
    d = tmp_path / "bot_events"
    d.mkdir()
    types = ["view", "click", "view", "click", "purchase"]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(1, n + 1), pa.int64()),
                "ts": pa.array(
                    [BASE + i * 10 * US for i in range(n)], pa.timestamp("us")
                ),
                "user_id": pa.array([7] * n, pa.int64()),
                "event_type": pa.array(
                    [types[i % len(types)] for i in range(n)], pa.string()
                ),
                "value": pa.array([1.0] * n, pa.float64()),
                "props": pa.array(["{}"] * n, pa.string()),
            }
        ),
        d / "events.parquet",
    )
    rows = CATALOG["session_top_paths"].fn(spark, str(d)).collect()
    assert len(rows) == 1
    assert rows[0]["path"] == "view>click>view>click>purchase"
    assert rows[0]["n_sessions"] == 1


def test_top_paths_census_is_takeordered_not_windowed(spark, events_sf):
    """The top-k must be TakeOrderedAndProject over the census — an
    unpartitioned row_number window would sort the full path census in one
    task at 100 TB path cardinality (the single-task-window anti-pattern);
    the only global window allowed is the rank over the <= 20 survivors."""
    plan = (
        CATALOG["session_top_paths"]
        .fn(spark, events_sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
