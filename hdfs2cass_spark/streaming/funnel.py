"""Streaming twins for the product-analytics family (oracle rows 69-70).

The batch `event_funnel_conversion` / `cohort_retention` queries
(plans/eventfunnel.py) re-scan the whole events corpus per report; a live
product stream wants the same answers maintained INCREMENTALLY. Per-user
state is tiny by construction — one timestamp per funnel step, one cohort
week plus the distinct active weeks — exactly the applyInPandasWithState
shape proven by streaming/stateful.py, so both twins ride it.

ORDER CONTRACT, stated precisely (the stream_curate precedent): with each
user's events arriving in non-decreasing ts order, the streamed funnel state
is row-identical to the batch ordered-funnel semantics (first view, first
click STRICTLY after it, first purchase after that) — the in-batch walk
sorts by (ts, event_id) and each step field is WRITE-ONCE, so the first
qualifying event in arrival order is the first in time order. Out-of-order
arrival across batches degrades GREEDILY, never retroactively: a late click
that time-sorts before an already-recorded click cannot replace it (state
is write-once), but a late event can still legally fill a step that is
unset. That greedy gap is the inherent online/offline difference, the same
boundary the curation stream documents — tests pin BOTH sides of it.

LATE DATA / WATERMARK: applyInPandasWithState does not drop late rows
automatically — the watermark here drives STATE EVICTION only: a user idle
(event time) past ``retention`` has their state dropped and a later return
restarts their journey. Size retention to the product's conversion horizon;
state per user stays O(1) regardless.

Scale shape: the stateful operator shards per-user state across executors
by the grouping key; emissions are (user, state) rows in update mode —
fields are write-once WITHIN a journey, and the final state recovers from
the emission log with a journey-keyed aggregate (latest t1 wins; see
funnel_states — a retention-evicted user who returns starts a new journey,
and a naive per-field max would merge the two). The report aggregates
#users-sized state, not #events-sized history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..plans.eventfunnel import FUNNEL_STEPS

RETENTION_MS = 30 * 24 * 3600 * 1000  # evict funnel state 30 days (event time) idle

_FUNNEL_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("t1_us", LongType()),
        StructField("t2_us", LongType()),
        StructField("t3_us", LongType()),
    ]
)
_FUNNEL_STATE = StructType(
    [
        StructField("t1_us", LongType()),
        StructField("t2_us", LongType()),
        StructField("t3_us", LongType()),
    ]
)


def stream_funnel(
    events: DataFrame,
    watermark: str = "2 hours",
    retention_ms: int = RETENTION_MS,
) -> DataFrame:
    """Incrementally maintained ordered-funnel state (view -> click ->
    purchase): one row per touched user per micro-batch with the write-once
    step timestamps (epoch micros; NULL = step not reached). Output mode
    "update"; recover final states with :func:`funnel_states`, report with
    :func:`funnel_report_from_states`."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    steps = list(FUNNEL_STEPS)

    # self-contained closure (the stateful.py contract): everything it touches
    # is a local or an installed package, so it ships to workers that do NOT
    # have this package on PYTHONPATH (cloudpickle would otherwise pickle
    # package globals by reference and the executor import would fail)
    def advance(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        had = state.exists
        t = list(state.get) if had else [None, None, None]
        changed = False
        # the group iterator yields one pandas frame PER ARROW CHUNK
        # (maxRecordsPerBatch rows each), not one per micro-batch — sorting
        # chunks independently would walk a user's events out of time order
        # whenever their batch spans chunks (>10k events), silently breaking
        # the in-batch ordering contract. Concat THEN sort; the memory bound
        # is one user's events per trigger, the sessionization class.
        frames = [pdf for pdf in pdfs if len(pdf)]
        rows = (
            pd.concat(frames).sort_values(["ts_us", "event_id"])
            if frames
            else pd.DataFrame(columns=["event_type", "ts_us"])
        )
        for ev, ts in zip(rows["event_type"], rows["ts_us"]):
            ts = int(ts)
            # write-once ordered transitions: a step fills only while
            # unset, only strictly after the previous step's timestamp
            if ev == steps[0] and t[0] is None:
                t[0], changed = ts, True
            elif ev == steps[1] and t[0] is not None and t[1] is None and ts > t[0]:
                t[1], changed = ts, True
            elif ev == steps[2] and t[1] is not None and t[2] is None and ts > t[1]:
                t[2], changed = ts, True
        if t[0] is None:
            return  # never entered the funnel: hold NO state for this user
        if changed:
            state.update(tuple(t))
        # retention is "after last funnel-step sighting": bump every batch
        # the user appears in. Anchored to max(watermark, batch max event
        # time): during batch 0 the watermark is still 0, and a 0-anchored
        # timeout lands in 1970 — every user seen only in the first batch
        # would be evicted at the very next trigger (self-review finding).
        mx_ms = int(rows["ts_us"].max()) // 1000 if len(rows) else 0
        state.setTimeoutTimestamp(
            max(state.getCurrentWatermarkMs(), mx_ms) + retention_ms
        )
        if changed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "t1_us": [t[0]],
                    "t2_us": [t[1]],
                    "t3_us": [t[2]],
                }
            )

    keyed = (
        events.filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_type").isin(steps)
        )
        .withWatermark("ts", watermark)
        .select(
            "user_id",
            "event_type",
            "event_id",
            "ts",
            F.unix_micros("ts").alias("ts_us"),
        )
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        advance,
        _FUNNEL_OUT,
        _FUNNEL_STATE,
        "update",
        GroupStateTimeout.EventTimeTimeout,
    )


def funnel_states(emissions: DataFrame) -> DataFrame:
    """Final per-user funnel state from an update-mode emission log.

    Within one journey the step fields are write-once (NULL until set, then
    constant) — but a user whose state was retention-EVICTED and who later
    returns starts a NEW journey with a later t1, and a plain per-field
    max() would merge the two into an impossible state (old journey's t2
    glued onto the new journey's t1). The log is therefore keyed by t1 —
    the journey identifier (strictly later for a later journey under the
    order contract) — and each field recovers as the max of
    (t1, field) structs: struct ordering picks the LATEST journey first,
    and within it the field's single non-NULL value (NULL struct fields
    sort below values)."""
    return emissions.groupBy("user_id").agg(
        F.max("t1_us").alias("t1_us"),
        F.max(F.struct("t1_us", "t2_us")).getField("t2_us").alias("t2_us"),
        F.max(F.struct("t1_us", "t3_us")).getField("t3_us").alias("t3_us"),
    )


def funnel_report_from_states(states: DataFrame) -> DataFrame:
    """(step, event_type, n_users, conversion_rate) — the exact shape of the
    batch event_funnel_conversion query (oracle row 69): one aggregate over
    #users-sized state into the SHARED report fold
    (plans/eventfunnel.py funnel_report_from_step_counts), so the rate
    semantics cannot drift between the batch and streaming surfaces."""
    from ..plans.eventfunnel import funnel_report_from_step_counts

    c = F.broadcast(
        states.agg(
            F.count("t1_us").cast("bigint").alias("c1"),
            F.count("t2_us").cast("bigint").alias("c2"),
            F.count("t3_us").cast("bigint").alias("c3"),
        )
    )
    return funnel_report_from_step_counts(c)


# ---------------------------------------------------------------------------
# Streaming cohort retention
# ---------------------------------------------------------------------------

_COHORT_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("cohort_day", IntegerType()),  # unix date of Monday
        StructField("week_day", IntegerType()),
    ]
)
_COHORT_STATE = StructType(
    [
        StructField("cohort_day", IntegerType()),
        StructField("weeks", ArrayType(IntegerType())),
    ]
)


def stream_cohorts(
    events: DataFrame,
    watermark: str = "2 hours",
    retention_ms: int = RETENTION_MS,
) -> DataFrame:
    """Incrementally maintained cohort activity: emits one
    (user_id, cohort_day, week_day) row the FIRST time a user is active in
    a week (append semantics — the emission log is exactly the distinct
    per-user active-week set), cohort = the Monday-start week of the user's
    first seen event. Per-user state is the cohort week plus the distinct
    active weeks — O(stream weeks), not O(events). Report with
    :func:`cohort_report_from_weeks`; same order contract as
    :func:`stream_funnel` (in-order arrival makes the cohort week exact)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    # self-contained closure: see stream_funnel. The Monday computation is
    # inlined so no package global is pickled by reference.
    def advance(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            cohort, weeks = state.get[0], list(state.get[1])
        else:
            cohort, weeks = None, []
        # fold across Arrow chunks (the iterator yields one frame per chunk,
        # not per micro-batch): the week set is order-free, but the cohort
        # must come from the batch's MINIMUM timestamp — taking the first
        # chunk's first event would pin a new user to the wrong cohort
        # whenever their earliest event lands in a later chunk
        new_weeks: list[int] = []
        min_ts: int | None = None
        max_ts = 0
        for pdf in pdfs:
            for v in pdf["ts_us"]:
                ts = int(v)
                if min_ts is None or ts < min_ts:
                    min_ts = ts
                if ts > max_ts:
                    max_ts = ts
                day = ts // 86_400_000_000
                wk = int(day - (day + 3) % 7)  # Monday start; 1970-01-01 = Thu
                if wk not in weeks and wk not in new_weeks:
                    new_weeks.append(wk)
        if cohort is None and min_ts is not None:
            day = min_ts // 86_400_000_000
            cohort = int(day - (day + 3) % 7)
        # state trim: weeks older than the retention horizon below the
        # newest seen week can never legally arrive under the order
        # contract — so per-user state is O(retention window), not O(user
        # lifetime). The boundary is ENFORCED, not assumed: a new week
        # below the floor is dropped rather than emitted, because its dedup
        # record may already have been trimmed and re-emitting would
        # duplicate a (user, cohort, week) row and inflate n_active (the
        # reports count, they don't re-distinct).
        all_weeks = weeks + new_weeks
        if all_weeks:
            floor_wk = max(all_weeks) - (retention_ms // 86_400_000) - 7
            all_weeks = [w for w in all_weeks if w >= floor_wk]
            new_weeks = [w for w in new_weeks if w >= floor_wk]
        state.update((cohort, all_weeks))
        # batch-max anchor: see stream_funnel (watermark is 0 in batch 0)
        state.setTimeoutTimestamp(
            max(state.getCurrentWatermarkMs(), max_ts // 1000) + retention_ms
        )
        if new_weeks:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(new_weeks),
                    "cohort_day": [cohort] * len(new_weeks),
                    "week_day": new_weeks,
                }
            )

    keyed = (
        events.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .withWatermark("ts", watermark)
        .select("user_id", "ts", F.unix_micros("ts").alias("ts_us"))
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        advance,
        _COHORT_OUT,
        _COHORT_STATE,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming engagement (DAU / WAU)
# ---------------------------------------------------------------------------

_DAYS_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("day", IntegerType()),  # unix date
    ]
)
_DAYS_STATE = StructType([StructField("days", ArrayType(IntegerType()))])


def stream_active_days(
    events: DataFrame,
    watermark: str = "2 hours",
    retention_ms: int = RETENTION_MS,
) -> DataFrame:
    """Incrementally maintained activity log: emits one (user_id, day) row
    the FIRST time a user is active on a day (append semantics — the
    emission log IS the distinct (user, day) pair set the batch
    engagement_dau_wau query computes from the corpus). Per-user state is
    the distinct active-day list (bounded by the retention horizon's days).
    Report with :func:`engagement_report_from_days`."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    # self-contained closure (see stream_funnel): day folding is
    # order-free, so no cross-chunk concat or min is needed here
    def advance(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        days = list(state.get[0]) if state.exists else []
        new: list[int] = []
        max_ts = 0
        for pdf in pdfs:
            for v in pdf["ts_us"]:
                ts = int(v)
                if ts > max_ts:
                    max_ts = ts
                d = ts // 86_400_000_000
                if d not in days and d not in new:
                    new.append(d)
        # state trim (the cohort-weeks argument): a day more than the
        # retention horizon older than the newest seen day cannot legally
        # arrive under the order contract, so dropping it from the dedup
        # state keeps per-user state O(retention window) over an
        # always-active user's lifetime. Enforced like the weeks trim:
        # a below-floor day is dropped, never re-emitted (its dedup record
        # may already be gone, and a duplicate pair would inflate DAU).
        all_days = days + new
        if all_days:
            floor_day = max(all_days) - (retention_ms // 86_400_000) - 1
            all_days = [d for d in all_days if d >= floor_day]
            new = [d for d in new if d >= floor_day]
        state.update((all_days,))
        # batch-max anchor: see stream_funnel (watermark is 0 in batch 0)
        state.setTimeoutTimestamp(
            max(state.getCurrentWatermarkMs(), max_ts // 1000) + retention_ms
        )
        if new:
            yield pd.DataFrame({"user_id": [key[0]] * len(new), "day": new})

    keyed = (
        events.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .withWatermark("ts", watermark)
        .select("user_id", "ts", F.unix_micros("ts").alias("ts_us"))
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        advance,
        _DAYS_OUT,
        _DAYS_STATE,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming RFM (the batch rfm_user_segments twin)
# ---------------------------------------------------------------------------

_RFM_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("last_day", IntegerType()),  # unix date
        StructField("n_events", LongType()),
        StructField("qsum", LongType()),  # 1e-6-quantized value sum
    ]
)
_RFM_STATE = StructType(
    [
        StructField("last_day", IntegerType()),
        StructField("n_events", LongType()),
        StructField("qsum", LongType()),
    ]
)


def stream_rfm(
    events: DataFrame,
    watermark: str = "2 hours",
    retention_ms: int = RETENTION_MS,
) -> DataFrame:
    """Incrementally maintained RFM metrics: per-user state is three
    scalars — last active unix date, event count, 1e-6-quantized value sum
    (the _qsum contract: floor(value * 1e6) int64 adds — order-independent,
    so the accumulated sum is bit-identical to the batch aggregate on the
    same rows). One (user_id, last_day, n_events, qsum) row per touched
    user per micro-batch (update mode); n_events is strictly increasing,
    so the latest state recovers as max by n_events. Report with
    :func:`rfm_report_from_log`. A retention-evicted user restarts from
    zero — the documented online/offline boundary (the stream_funnel
    contract); within retention, stream == batch exactly."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def advance(key, pdfs, state):
        import math

        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            last_day, n, qs = state.get
        else:
            last_day, n, qs = -1, 0, 0
        max_ts = 0
        touched = False
        for pdf in pdfs:
            for ts, v in zip(pdf["ts_us"], pdf["value"]):
                touched = True
                ts = int(ts)
                if ts > max_ts:
                    max_ts = ts
                d = ts // 86_400_000_000
                if d > last_day:
                    last_day = d
                n += 1
                if v is not None and not (isinstance(v, float) and math.isnan(v)):
                    qs += int(math.floor(float(v) * 1_000_000))
        if not touched:
            return
        state.update((int(last_day), int(n), int(qs)))
        # batch-max anchor: see stream_funnel (watermark is 0 in batch 0)
        state.setTimeoutTimestamp(
            max(state.getCurrentWatermarkMs(), max_ts // 1000) + retention_ms
        )
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "last_day": [int(last_day)],
                "n_events": [int(n)],
                "qsum": [int(qs)],
            }
        )

    keyed = (
        events.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .withWatermark("ts", watermark)
        .select("user_id", "ts", "value", F.unix_micros("ts").alias("ts_us"))
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        advance,
        _RFM_OUT,
        _RFM_STATE,
        "update",
        GroupStateTimeout.EventTimeTimeout,
    )


def rfm_report_from_log(emissions: DataFrame) -> DataFrame:
    """(user_id, recency_days, frequency, monetary, r_q, f_q, m_q, segment)
    — the exact shape of the batch rfm_user_segments (oracle row 82) —
    from the streamed per-user state log. n_events is strictly increasing
    within a user, so max(struct(n_events, ...)) recovers the latest
    state; the recency anchor is the max last_day over users (identical to
    the batch corpus-max-day anchor on the same data); the quintile/
    segment fold is SHARED (plans/rfm.py rfm_from_metrics)."""
    from ..plans.rfm import rfm_from_metrics

    latest = emissions.groupBy("user_id").agg(
        F.max(F.struct("n_events", "last_day", "qsum")).alias("s")
    )
    anchor = latest.agg(F.max("s.last_day").alias("_a"))
    u = latest.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        (F.col("_a") - F.col("s.last_day")).cast("int").alias("recency_days"),
        F.col("s.n_events").cast("bigint").alias("frequency"),
        (F.col("s.qsum").cast("double") / 1_000_000).alias("monetary"),
    )
    return rfm_from_metrics(u)


# ---------------------------------------------------------------------------
# Streaming event-transition matrix (the batch event_transition_matrix twin)
# ---------------------------------------------------------------------------

_TRANS_OUT = StructType(
    [
        StructField("prev_type", StringType()),
        StructField("next_type", StringType()),
        StructField("n", LongType()),
    ]
)
_TRANS_STATE = StructType(
    [
        StructField("last_type", StringType()),
        StructField("last_ts_us", LongType()),
        StructField("last_event_id", LongType()),
    ]
)


def stream_transitions(
    events: DataFrame,
    watermark: str = "2 hours",
    retention_ms: int = RETENTION_MS,
) -> DataFrame:
    """Incrementally maintained next-event transitions: per-user state is
    ONLY the last seen event (type, ts, event_id) — O(1) per user. Each
    micro-batch walks the user's events in (ts, event_id) order and emits
    the batch's (prev_type, next_type, n) transition counts (update mode,
    counts are PER BATCH and additive — the report sums them). Report with
    :func:`transition_report_from_log`.

    ORDER CONTRACT (the stream_funnel boundary): in-order arrival per user
    reproduces the batch lead()-pair multiset exactly (same (ts, event_id)
    walk). Out-of-order arrival degrades GREEDILY: a late event pairs with
    whatever the state last saw — it cannot retroactively re-pair earlier
    transitions. A retention-evicted user who returns loses exactly the
    one transition that would have crossed the eviction gap."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def advance(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            last_type, last_ts, last_eid = state.get
        else:
            last_type = None
            last_ts = last_eid = 0
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            return
        rows = pd.concat(frames).sort_values(["ts_us", "event_id"])
        counts: dict[tuple[str, str], int] = {}
        for ev, ts, eid in zip(rows["event_type"], rows["ts_us"], rows["event_id"]):
            ts, eid = int(ts), int(eid)
            if last_type is not None:
                k = (last_type, str(ev))
                counts[k] = counts.get(k, 0) + 1
            last_type, last_ts, last_eid = str(ev), ts, eid
        state.update((last_type, last_ts, last_eid))
        # batch-max anchor: see stream_funnel (watermark is 0 in batch 0)
        mx_ms = int(rows["ts_us"].max()) // 1000
        state.setTimeoutTimestamp(
            max(state.getCurrentWatermarkMs(), mx_ms) + retention_ms
        )
        if counts:
            ks = sorted(counts)
            yield pd.DataFrame(
                {
                    "prev_type": [k[0] for k in ks],
                    "next_type": [k[1] for k in ks],
                    "n": [counts[k] for k in ks],
                }
            )

    keyed = (
        events.filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .withWatermark("ts", watermark)
        .select(
            "user_id", "ts", "event_id", "event_type",
            F.unix_micros("ts").alias("ts_us"),
        )
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        advance,
        _TRANS_OUT,
        _TRANS_STATE,
        "update",
        GroupStateTimeout.EventTimeTimeout,
    )


def transition_report_from_log(emissions: DataFrame) -> DataFrame:
    """(prev_type, next_type, n, p_next) — the exact shape of the batch
    event_transition_matrix (oracle row 72) — from the streamed per-batch
    transition counts. Counts are additive across batches (each transition
    is emitted exactly once, in the batch that observed its second event),
    so a plain sum recovers the totals; the row-normalizing fold is SHARED
    (plans/eventfunnel.py transition_report_from_counts)."""
    from ..plans.eventfunnel import transition_report_from_counts

    t = emissions.groupBy("prev_type", "next_type").agg(
        F.sum("n").cast("bigint").alias("n")
    )
    return transition_report_from_counts(t)


# ---------------------------------------------------------------------------
# Streaming session-path census (the batch session_top_paths twin)
# ---------------------------------------------------------------------------

_PATHS_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("path", StringType()),
    ]
)
_PATHS_STATE = StructType(
    [
        StructField("session_start_us", LongType()),
        StructField("last_ts_us", LongType()),
        StructField("n", IntegerType()),
        StructField("path", StringType()),
    ]
)

SESSION_GAP_US = 1_800_000_000  # the ONE 30-min gap (plans/catalog.sessionized)


def stream_session_paths(
    events: DataFrame,
    watermark: str = "2 hours",
    retention_ms: int = RETENTION_MS,
    path_steps: int = 5,
) -> DataFrame:
    """Incrementally maintained session paths: per-user state is ONLY the
    CURRENT session (start, last event time, first ``path_steps`` event
    types joined with '>') — O(1) per user by construction, the bound the
    batch query gets from its pre-groupBy row_number filter. Every time a
    session's path changes, (user_id, session_start_us, path) is emitted;
    the path within one session only ever GROWS by appending, so the
    emission log recovers each session's final path as its LONGEST logged
    path (the funnel_states journey-key pattern, keyed by session start) —
    a session closing (gap exceeded / state evicted) needs no extra
    emission. Census with :func:`session_paths_from_log`.

    ORDER CONTRACT (the stream_funnel boundary): with each user's events
    arriving in non-decreasing ts order, session boundaries and paths are
    row-identical to the batch 30-min-gap sessionization (both walk events
    in (ts, event_id) order; the gap test is the same strict
    ts - prev > 30 min in µs). Out-of-order arrival degrades GREEDILY: a
    late event time-sorts within its own batch, but against state it can
    only extend the CURRENT session (ts - last < 0 never opens a gap) —
    it cannot retroactively split a session or reorder an already-built
    path prefix. NULL user/ts/event_type rows are excluded, matching the
    batch _PATH_WHERE."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = SESSION_GAP_US
    steps = int(path_steps)

    # self-contained closure (the stateful.py contract)
    def advance(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            start, last, n, path = state.get
        else:
            start = None
            last = n = 0
            path = ""
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            return
        rows = pd.concat(frames).sort_values(["ts_us", "event_id"])
        out_starts: list[int] = []
        out_paths: list[str] = []
        dirty = False
        for ev, ts in zip(rows["event_type"], rows["ts_us"]):
            ts = int(ts)
            if start is None or ts - last > gap_us:
                if start is not None and dirty:
                    # the closing session changed in THIS batch: emit its
                    # final form before switching (unchanged-since-last-
                    # batch sessions were already fully logged)
                    out_starts.append(start)
                    out_paths.append(path)
                start, last, n, path, dirty = ts, ts, 1, str(ev), True
            else:
                if n < steps:
                    path = f"{path}>{ev}"
                    n += 1
                    dirty = True
                if ts > last:
                    last = ts
        state.update((start, last, n, path))
        # batch-max anchor: see stream_funnel (watermark is 0 in batch 0)
        state.setTimeoutTimestamp(
            max(state.getCurrentWatermarkMs(), last // 1000) + retention_ms
        )
        if dirty:
            out_starts.append(start)
            out_paths.append(path)
        if out_starts:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out_starts),
                    "session_start_us": out_starts,
                    "path": out_paths,
                }
            )

    keyed = (
        events.filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .withWatermark("ts", watermark)
        .select(
            "user_id", "ts", "event_id", "event_type",
            F.unix_micros("ts").alias("ts_us"),
        )
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        advance,
        _PATHS_OUT,
        _PATHS_STATE,
        "update",
        GroupStateTimeout.EventTimeTimeout,
    )


def session_paths_from_log(emissions: DataFrame) -> DataFrame:
    """(rnk, path, n_sessions, share) — the exact shape of the batch
    session_top_paths query (oracle row 77) — from the streamed
    (user_id, session_start_us, path) update log. Within one session the
    path only grows by appending (write-once prefix), so the final path is
    the LONGEST logged one — recovered with a max over (length, path)
    structs per (user, session-start) journey key, then folded through the
    SHARED census (plans/sessions.py top_paths_report), so the two
    surfaces cannot drift."""
    from ..plans.sessions import top_paths_report

    paths = emissions.groupBy("user_id", "session_start_us").agg(
        F.max(F.struct(F.length("path").alias("_l"), F.col("path")))["path"].alias(
            "path"
        )
    )
    return top_paths_report(paths)


def engagement_report_from_days(pairs: DataFrame) -> DataFrame:
    """(day, dau, wau, stickiness) from the streamed (user_id, day) emission
    log — literally the batch query's computation (plans/sessions.py
    engagement_from_pairs), so the two surfaces cannot drift; the log is
    distinct by construction."""
    from ..plans.sessions import engagement_from_pairs

    return engagement_from_pairs(
        pairs.select("user_id", F.date_from_unix_date("day").alias("day"))
    )


def cohort_report_from_weeks(pairs: DataFrame) -> DataFrame:
    """(cohort_week, week_offset, n_active, cohort_size, retention) — the
    exact shape of the batch cohort_retention query (oracle row 70) — from
    the streamed (user_id, cohort_day, week_day) emission log.

    EVICTION-INDUCED COHORT SPLITS are healed here (round-7 advice): a
    retention-evicted user who returns is assigned a NEW cohort_day by
    :func:`stream_cohorts` (its state is gone — it cannot know the old
    one), so the raw log can hold one user's weeks under TWO cohorts, and a
    naive per-row aggregate would count that user in both cohorts'
    n_active/cohort_size — diverging from the batch cohort_retention, which
    pins ONE first-event cohort per user. The fix is the funnel_states
    journey-recovery pattern: re-key every week row to the user's EARLIEST
    logged cohort (the batch definition) via a user-partitioned min window,
    then distinct — a post-eviction week re-emission (its dedup state was
    also evicted) collapses with its earlier twin once both carry the same
    cohort. One hash(user_id) shuffle; the distinct reuses the window's
    partitioning (user_id ⊂ the distinct key). Grain after the aggregate is
    #cohorts x #offsets; the base-size join and rounding are the SHARED
    fold (plans/eventfunnel.py cohort_report_from_act)."""
    from pyspark.sql.window import Window

    from ..plans.eventfunnel import cohort_report_from_act

    one_cohort = pairs.select(
        "user_id",
        F.min("cohort_day").over(Window.partitionBy("user_id")).alias("cohort_day"),
        "week_day",
    ).distinct()
    act = one_cohort.groupBy(
        F.date_from_unix_date("cohort_day").alias("cohort_week"),
        ((F.col("week_day") - F.col("cohort_day")) / F.lit(7))
        .cast("int")
        .alias("week_offset"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    return cohort_report_from_act(act)
