"""Ordered event-funnel conversion: the product-analytics staple.

``event_funnel_conversion`` answers "of the users who did step 1, how many
went on to do step 2 AFTER it, then step 3 after that" for the classic
view -> click -> purchase funnel: per user, t1 = first view, t2 = first
click strictly after t1, t3 = first purchase strictly after t2; the report
is one row per step with the user count, the count converted from the
previous step, and the conversion rate (NULL-safe when a step empties).

This is ORDERED funnel semantics — a click before the user's first view
does not count — which plain conditional aggregation cannot express; each
step needs the previous step's per-user timestamp.

100 TB shape: three per-user aggregates chained by equi-joins ON the same
user_id key — after the first exchange the join output keeps
hashpartitioning(user_id), so steps 2 and 3 aggregate WITHOUT new
exchanges (one shuffle of the events scan per step's filtered slice,
nothing corpus-wide beyond that); the final report folds three 1-row
counts with broadcast cross joins. No per-user event list is ever
collected; state per user is one timestamp per step. NULL user_ids are
excluded (they cannot form a journey).

``cohort_retention`` is the companion staple: Monday-start weekly cohorts
by first event, distinct-active-user counts per (cohort, week offset),
retention vs the offset-0 cohort size.

Registered last so the pair appends to the driver's checked prefix as
oracle rows #69-70.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .registry import declare

FUNNEL_STEPS = ["view", "click", "purchase"]


@declare(
    "event_funnel_conversion",
    oracle=f"""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = '{FUNNEL_STEPS[0]}' AND user_id IS NOT NULL
        AND ts IS NOT NULL
      GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > s1.t1
      GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > s2.t2
      GROUP BY e.user_id),
    c AS (SELECT (SELECT COUNT(*) FROM s1) AS c1,
                 (SELECT COUNT(*) FROM s2) AS c2,
                 (SELECT COUNT(*) FROM s3) AS c3)
    SELECT 1 AS step, '{FUNNEL_STEPS[0]}' AS event_type,
           CAST(c1 AS BIGINT) AS n_users,
           CAST(NULL AS DOUBLE) AS conversion_rate
    FROM c
    UNION ALL
    SELECT 2, '{FUNNEL_STEPS[1]}', CAST(c2 AS BIGINT),
           round(CAST(c2 AS DOUBLE) / nullif(c1, 0), 6)
    FROM c
    UNION ALL
    SELECT 3, '{FUNNEL_STEPS[2]}', CAST(c3 AS BIGINT),
           round(CAST(c3 AS DOUBLE) / nullif(c2, 0), 6)
    FROM c
    ORDER BY step
    """,
    doc="Ordered funnel conversion (view -> click -> purchase): per user, "
    "first view, first click STRICTLY AFTER it, first purchase after that "
    "— a later-step event before the user's earlier step never counts (the "
    "semantics conditional aggregation cannot express). Per-step user "
    "counts + NULL-safe conversion rates. Three per-user aggregates "
    "chained by joins on the SAME user_id key, so steps 2-3 reuse the "
    "partitioning with no new exchange; per-user state is one timestamp "
    "per step, never an event list.",
)
def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    steps = funnel_user_steps(e, FUNNEL_STEPS)
    counts = [
        F.broadcast(s.agg(F.count(F.lit(1)).cast("bigint").alias(f"c{i + 1}")))
        for i, s in enumerate(steps)
    ]
    c = counts[0]
    for extra in counts[1:]:
        c = c.crossJoin(extra)
    return funnel_report_from_step_counts(c)


def funnel_report_from_step_counts(c: DataFrame) -> DataFrame:
    """(step, event_type, n_users, conversion_rate) from a ONE-ROW
    (c1..cN) per-step user-count frame — the report fold shared by the
    batch query above and the streaming funnel
    (streaming/funnel.py funnel_report_from_states), so the rate/NULL
    semantics cannot drift between the two surfaces."""

    def _row(i: int, name: str) -> DataFrame:
        rate = (
            F.lit(None).cast("double")
            if i == 0
            else F.round(
                F.col(f"c{i + 1}").cast("double")
                / F.nullif(F.col(f"c{i}"), F.lit(0)),
                6,
            )
        )
        return c.select(
            F.lit(i + 1).alias("step"),
            F.lit(name).alias("event_type"),
            F.col(f"c{i + 1}").alias("n_users"),
            rate.alias("conversion_rate"),
        )

    out = _row(0, FUNNEL_STEPS[0])
    for i, name in enumerate(FUNNEL_STEPS[1:], start=1):
        out = out.unionByName(_row(i, name))
    return out.orderBy("step")


@declare(
    "cohort_retention",
    oracle="""
    WITH fw AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      GROUP BY user_id),
    aw AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    act AS (
      SELECT fw.cohort_week,
             CAST(date_diff('day', fw.cohort_week, aw.week) // 7 AS INTEGER)
               AS week_offset,
             CAST(COUNT(*) AS BIGINT) AS n_active
      FROM aw JOIN fw USING (user_id)
      GROUP BY fw.cohort_week, week_offset),
    base AS (
      SELECT cohort_week, n_active AS cohort_size FROM act WHERE week_offset = 0)
    SELECT act.cohort_week, act.week_offset, act.n_active,
           base.cohort_size,
           round(CAST(act.n_active AS DOUBLE) / base.cohort_size, 6) AS retention
    FROM act JOIN base USING (cohort_week)
    ORDER BY cohort_week, week_offset
    """,
    doc="Weekly cohort retention — the other product-analytics staple: "
    "users cohort by the Monday-start week of their FIRST event; for each "
    "(cohort week, week offset) the distinct active users and the "
    "retention rate vs the cohort's size at offset 0 (offset 0 is the "
    "cohort size by construction — every user is active in their first "
    "week). Two per-user aggregates (first week; distinct active weeks) "
    "joined on user_id, then a small (cohorts x offsets) aggregate; the "
    "base-size join touches #cohorts rows. Engine-exact: date_trunc(week) "
    "is Monday-start on both engines, offsets are integer day-diffs / 7.",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    fw = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    aw = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    act = (
        aw.join(fw, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / F.lit(7))
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )
    return cohort_report_from_act(act)


def cohort_report_from_act(act: DataFrame) -> DataFrame:
    """The retention report from a (cohort_week, week_offset, n_active)
    activity aggregate — shared by the batch query above and the streaming
    cohort log (streaming/funnel.py cohort_report_from_weeks), so the
    base-size join and rounding cannot drift between the two surfaces."""
    # cohort_size rides a window over the POST-AGGREGATE act frame (grain:
    # #cohort-weeks partitions), not a filter + broadcast join-back, which
    # Catalyst inlines as a SECOND full activity-aggregate subtree per
    # action (r13; the dsir/top_paths precedent). A cohort with no
    # offset-0 row sums to NULL and the NOT-NULL filter reproduces the
    # former inner join exactly.
    w_cohort = Window.partitionBy("cohort_week")
    return (
        act.withColumn(
            "cohort_size",
            F.sum(F.when(F.col("week_offset") == 0, F.col("n_active"))).over(
                w_cohort
            ),
        )
        .filter(F.col("cohort_size").isNotNull())
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active").cast("double") / F.col("cohort_size"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


@declare(
    "funnel_time_to_convert",
    oracle=f"""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = '{FUNNEL_STEPS[0]}' AND user_id IS NOT NULL
        AND ts IS NOT NULL
      GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > s1.t1
      GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > s2.t2
      GROUP BY e.user_id),
    d AS (
      SELECT (epoch_us(s3.t3) - epoch_us(s1.t1)) // 60000000 AS m
      FROM s3 JOIN s1 USING (user_id)),
    h AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS cnt FROM d GROUP BY m),
    c AS (
      SELECT m, cnt,
             SUM(cnt) OVER (ORDER BY m) AS ccnt,
             SUM(cnt) OVER () AS n,
             SUM(m * cnt) OVER () AS sm
      FROM h)
    SELECT CAST(n AS BIGINT) AS n_converted,
           round(CAST(sm AS DOUBLE) / n, 6) AS avg_minutes,
           round((MIN(CASE WHEN ccnt >= floor((n + 1) / 2.0) THEN m END)
                  + MIN(CASE WHEN ccnt >= ceil((n + 1) / 2.0) THEN m END))
                 / 2.0, 6) AS median_minutes,
           CAST(MIN(CASE WHEN ccnt >= ceil(0.9 * n) THEN m END) AS BIGINT)
             AS p90_minutes,
           CAST(MAX(m) AS BIGINT) AS max_minutes
    FROM c GROUP BY n, sm
    """,
    doc="Time-to-convert statistics for the full funnel: per converted "
    "user, whole minutes from first view to qualifying purchase (exact "
    "int64 epoch-microsecond difference, integer-divided — never engine "
    "minute-boundary semantics), then EXACT median/p90/max via the value "
    "HISTOGRAM (the corpus_stats_report trick): corpus-sized work is one "
    "map-side-combined aggregate, the sort window sees only #distinct-"
    "minutes rows, so a million converters cannot create a single-task "
    "window. Empty funnel -> empty result on both engines.",
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..functions.ts import epoch_micros

    e = load_table(spark, sf_dir, "events")
    s1, _, s3 = funnel_user_steps(e, FUNNEL_STEPS)
    # integral div (never a double division + cast — a converter landing
    # exactly on a minute boundary could round below the true quotient)
    d = (
        s3.join(s1, "user_id")
        .select(
            epoch_micros("t3").alias("_e3"), epoch_micros("t1").alias("_e1")
        )
        .selectExpr("(_e3 - _e1) div 60000000 AS m")
    )
    h = d.groupBy("m").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    ow = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    allw = Window.partitionBy()
    c = h.select(
        "m",
        "cnt",
        F.sum("cnt").over(ow).alias("ccnt"),
        F.sum("cnt").over(allw).alias("n"),
        F.sum(F.col("m") * F.col("cnt")).over(allw).alias("sm"),
    )
    lo = F.floor((F.col("n") + 1) / 2.0)
    hi = F.ceil((F.col("n") + 1) / 2.0)
    p90k = F.ceil(0.9 * F.col("n"))
    return c.groupBy("n", "sm").agg(
        F.round(
            (
                F.min(F.when(F.col("ccnt") >= lo, F.col("m")))
                + F.min(F.when(F.col("ccnt") >= hi, F.col("m")))
            )
            / 2.0,
            6,
        ).alias("median_minutes"),
        F.min(F.when(F.col("ccnt") >= p90k, F.col("m")))
        .cast("bigint")
        .alias("p90_minutes"),
        F.max("m").cast("bigint").alias("max_minutes"),
    ).select(
        F.col("n").cast("bigint").alias("n_converted"),
        F.round(F.col("sm").cast("double") / F.col("n"), 6).alias("avg_minutes"),
        "median_minutes",
        "p90_minutes",
        "max_minutes",
    )


@declare(
    "event_transition_matrix",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
    t AS (
      SELECT event_type AS prev_type, next_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM o WHERE next_type IS NOT NULL
      GROUP BY prev_type, next_type),
    s AS (SELECT prev_type, SUM(n) AS n_prev FROM t GROUP BY prev_type)
    SELECT t.prev_type, t.next_type, t.n,
           round(CAST(t.n AS DOUBLE) / s.n_prev, 6) AS p_next
    FROM t JOIN s USING (prev_type)
    ORDER BY prev_type, next_type
    """,
    doc="Event transition matrix — per-user NEXT-event statistics (the "
    "Markov table behind session/path analysis): events order per user by "
    "(ts, event_id) — the id tiebreak makes simultaneous events "
    "deterministic — lead() pairs each event with its successor, and the "
    "matrix reports each (prev, next) count plus P(next | prev). The "
    "window partitions BY USER (parallel, bounded by one user's events — "
    "never a global sort); the matrix itself is #event-types^2 rows, and "
    "the row-normalizing join touches #event-types rows. NULL "
    "user/ts/type rows cannot form transitions and are excluded.",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
    )
    o = e.select(
        "event_type",
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("next_type"),
    )
    t = (
        o.filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("prev_type"), "next_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return transition_report_from_counts(t)


def transition_report_from_counts(t: DataFrame) -> DataFrame:
    """The (prev_type, next_type, n, p_next) matrix from a
    (prev_type, next_type, n) transition-count table — the ONE
    row-normalizing fold, shared by the batch query above and the streaming
    transition log (streaming/funnel.py transition_report_from_log), so the
    P(next | prev) semantics cannot drift. Grain in = grain out =
    #event-types^2 rows; the normalizer join touches #event-types rows.
    The normalizer side renames its key before the self-join: both sides
    derive from the same relation, and when that relation is a bare scan
    (the streaming memory sink) the analyzer cannot disambiguate the
    shared attribute ids."""
    # the row normalizer rides a window over the POST-AGGREGATE count table
    # (grain: #event-types partitions), not a re-aggregate + broadcast
    # join-back, which Catalyst inlines as a SECOND transition-count subtree
    # per action (r13). Every t row's prev_type is in its own partition by
    # construction, so the window sum equals the former inner-join value.
    return (
        t.withColumn("n_prev", F.sum("n").over(Window.partitionBy("prev_type")))
        .select(
            "prev_type",
            "next_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("n_prev"), 6).alias(
                "p_next"
            ),
        )
        .orderBy("prev_type", "next_type")
    )


def funnel_user_steps(e: DataFrame, steps: list[str]) -> list[DataFrame]:
    """Per-user first-timestamp tables [s1, s2, ...] for an ordered funnel:
    s_k holds users whose first step-k event lies strictly after their
    step-(k-1) timestamp. Composable over any (user_id, ts, event_type)
    DataFrame."""
    prev: DataFrame | None = None
    out: list[DataFrame] = []
    for k, ev in enumerate(steps):
        # NULL ts can no more form a journey than a NULL user (for steps
        # past the first, ts > t_prev already rejects NULL — the explicit
        # filter keeps step 1 consistent with cohort_retention)
        cur = e.filter(F.col("event_type") == ev).filter(
            F.col("user_id").isNotNull() & F.col("ts").isNotNull()
        )
        if prev is None:
            s = cur.groupBy("user_id").agg(F.min("ts").alias("t1"))
        else:
            tprev = f"t{k}"
            s = (
                cur.join(prev, "user_id")
                .filter(F.col("ts") > F.col(tprev))
                .groupBy("user_id")
                .agg(F.min("ts").alias(f"t{k + 1}"))
            )
        out.append(s)
        prev = s
    return out
