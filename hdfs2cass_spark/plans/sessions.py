"""Session-path and engagement analytics (oracle rows 77-78) — the last two
product-analytics staples next to the funnel/cohort/transition family.

  - ``session_top_paths``: the Sankey source — sessionize (the ONE shared
    30-minute-gap definition, plans/catalog.py:sessionized), take each
    session's first 5 event types in (ts, event_id) order as a '>'-joined
    path, and report the top 20 paths by session count with each path's
    share of all sessions.
  - ``engagement_dau_wau``: per active day, the distinct daily actives
    (DAU), the distinct actives over the trailing 7 days (WAU), and the
    DAU/WAU stickiness ratio.

100 TB shapes: paths ride the same user_id window partitioning as
sessionization (bounded by one user's events, never a global sort), the
path census is a map-side-combined groupBy on the path string, the top-20
is TakeOrderedAndProject (mappers truncate), and the share denominator is
a 1-row broadcast count-fold — the path-grain table is never windowed.
DAU/WAU: the corpus collapses to distinct (user, day) pairs first, the
trailing window is a map-only 1->7 explode of those pairs joined to the
(broadcast, tiny) active-day list — the classic exact-sliding-distinct
shape without a range self-join of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .catalog import session_cte_sql, sessionized
from .registry import declare

PATH_STEPS = 5
TOP_PATHS = 20
WAU_DAYS = 7

# NULL policy, pinned: rows with NULL user/ts/event_type cannot take part in
# a path (Spark sorts NULLs FIRST, DuckDB LAST — an unfiltered NULL ts would
# session and order DIFFERENTLY per engine; tests/test_null_edges.py plants
# exactly that row). The filter lives in the shared CTE call AND the Spark
# plan, and sessionize_events_batch (row 25) keeps its own historical
# unfiltered contract.
_PATH_WHERE = (
    " WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL"
)
_SESSION_CTE = session_cte_sql("event_type", _PATH_WHERE)


@declare(
    "session_top_paths",
    oracle=f"""
    WITH {_SESSION_CTE},
    paths AS (
      SELECT array_to_string(
               (list(event_type ORDER BY ts, event_id))[1:{PATH_STEPS}], '>')
               AS path
      FROM numbered GROUP BY user_id, session_no),
    census AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
               FROM paths GROUP BY path),
    tot AS (SELECT CAST(SUM(n_sessions) AS BIGINT) AS t FROM census),
    ranked AS (
      SELECT path, n_sessions,
             round(CAST(n_sessions AS DOUBLE) / t, 6) AS share,
             ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path) AS rnk
      FROM census CROSS JOIN tot)
    SELECT CAST(rnk AS INTEGER) AS rnk, path, n_sessions, share
    FROM ranked WHERE rnk <= {TOP_PATHS} ORDER BY rnk
    """,
    doc=f"Top session paths (the Sankey source): sessionize with the SHARED "
    f"30-min-gap definition, join each session's first {PATH_STEPS} event "
    f"types in (ts, event_id) order into a '>' path, census the paths, "
    f"report the top {TOP_PATHS} by session count with each path's share "
    f"of all sessions. Scale: the per-session path comes from the same "
    f"user_id window partitioning as sessionization; the census map-side-"
    f"combines; the top-k is TakeOrderedAndProject; the share denominator "
    f"is a 1-row broadcast fold (no window over the path grain).",
)
def session_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    # NULL filter mirrors the oracle's CTE WHERE (see _PATH_WHERE)
    numbered = sessionized(
        load_table(spark, sf_dir, "events").filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_type").isNotNull()
        )
    )
    # Bound the aggregation state BEFORE grouping: a bot/instrumentation-loop
    # user emitting events forever at <30-min gaps produces ONE unbounded
    # session, and a bare collect_list would materialize every event in that
    # group's agg buffer (the classic hot-group OOM at 100x). Number events
    # within the session and keep only the first PATH_STEPS, so the
    # collect_list input — and the agg state — is <= PATH_STEPS structs per
    # session. The window adds NO shuffle: hash(user_id) from sessionization
    # already clusters (user_id, session_no), Spark only re-sorts in place.
    in_session = Window.partitionBy("user_id", "session_no").orderBy("ts", "event_id")
    head = numbered.withColumn("rn", F.row_number().over(in_session)).filter(
        F.col("rn") <= PATH_STEPS
    )
    # deterministic in-session order: array_sort over (ts, event_id,
    # event_type) structs sorts by field order (<= PATH_STEPS elements)
    path = F.expr(
        "array_join(transform(array_sort(collect_list("
        "struct(ts, event_id, event_type))),"
        " s -> s.event_type), '>')"
    )
    paths = head.groupBy("user_id", "session_no").agg(path.alias("path"))
    return top_paths_report(paths)


def top_paths_report(paths: DataFrame) -> DataFrame:
    """(rnk, path, n_sessions, share) from a one-row-per-session ``path``
    frame — the ONE census fold, shared by the batch query above and the
    streaming session-path log (streaming/funnel.py
    session_paths_from_log), so the census/share/top-k semantics cannot
    drift between the two surfaces."""
    from pyspark.sql.window import Window

    census = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )
    # the session total rides an unbounded window over the POST-AGGREGATE
    # census, NOT a census.agg() + crossJoin: Catalyst inlines the latter as
    # a SECOND full sessionize->paths->census subtree per action (the r13
    # before-plan shows the whole window pipeline twice, no ReusedExchange).
    # The window's single partition sees #distinct-paths rows — bounded by
    # the event-type alphabet ^ PATH_STEPS, corpus-size-independent — and
    # the same bigint sum yields the identical total.
    census = census.withColumn(
        "t", F.sum("n_sessions").over(Window.partitionBy()).cast("bigint")
    )
    # top-k FIRST via orderBy+limit -> TakeOrderedAndProject (census is
    # already on one partition post-window; mappers truncate to 20),
    # THEN rank: the row_number window is global but sees <= TOP_PATHS rows
    top = (
        census
        .select(
            "path",
            "n_sessions",
            F.round(F.col("n_sessions").cast("double") / F.col("t"), 6).alias("share"),
        )
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(TOP_PATHS)
    )
    return (
        top.withColumn(
            "rnk",
            F.row_number()
            .over(Window.orderBy(F.col("n_sessions").desc(), "path"))
            .cast("int"),
        )
        .select("rnk", "path", "n_sessions", "share")
        .orderBy("rnk")
    )


@declare(
    "engagement_dau_wau",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    days AS (SELECT DISTINCT day FROM ud),
    dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day),
    wau AS (
      SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
      FROM days d JOIN ud u
        ON u.day BETWEEN d.day - {WAU_DAYS - 1} AND d.day
      GROUP BY d.day)
    SELECT dau.day, dau.dau, wau.wau,
           round(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
    FROM dau JOIN wau USING (day) ORDER BY day
    """,
    doc=f"DAU / trailing-{WAU_DAYS}-day WAU / stickiness per active day. "
    f"Scale: the corpus first collapses to DISTINCT (user, day) pairs (one "
    f"shuffle, map-side combined); the trailing window is a map-only 1->"
    f"{WAU_DAYS} explode of those pairs restricted to the (broadcast, "
    f"#days-sized) active-day list — exact sliding distinct WITHOUT a "
    f"range self-join of the corpus; both counts then aggregate at day "
    f"grain. NULL user/ts rows can be active on no day and are excluded.",
)
def engagement_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    ud = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    return engagement_from_pairs(ud)


def engagement_from_pairs(ud: DataFrame) -> DataFrame:
    """The report over DISTINCT (user_id, day DATE) activity pairs — the ONE
    DAU/WAU computation, shared by the batch query above and the streaming
    active-day emission log (streaming/funnel.py stream_active_days), so
    the two surfaces cannot drift."""
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    # each (user, day) pair covers target days day..day+6; target days
    # nobody was active on are dropped by the final INNER join on dau's day
    # list, so the former broadcast observed-day pre-filter (a THIRD
    # corpus-distinct subtree per action — Catalyst inlines ud for it) only
    # pre-shrunk the wau aggregate's input by the unobserved-day fraction.
    # r13: removed — the explode count is bounded at WAU_DAYS x |ud| either
    # way and one full distinct pass of the corpus disappears.
    targets = ud.select(
        "user_id",
        F.explode(
            F.expr(f"transform(sequence(0, {WAU_DAYS - 1}), i -> date_add(day, i))")
        ).alias("day"),
    )
    wau = targets.groupBy("day").agg(
        F.countDistinct("user_id").cast("bigint").alias("wau")
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias("stickiness"),
        )
        .orderBy("day")
    )
