"""RFM user segmentation (oracle row 82) — the classic product-analytics
user-grain rollup next to the funnel/cohort/path/engagement family.

Recency / Frequency / Monetary (Hughes 1994; every CRM and growth stack
since): per user, days since last activity, event count, and value sum —
each independently scored into global quintiles (1 = best), concatenated
into the familiar 'R1F2M1' segment label. The quintiles ride the round-8
histogram-rank NTILE (operators/ntile.py), three applications over the
USER-GRAIN table:

100 TB shape: the corpus collapses to one row per user first (ONE
map-side-combined aggregate — the only event-grain pass); the recency
anchor (corpus max day) is a 1-row broadcast fold; each quintile is the
exact_ntile scheme — a cumulative window over the metric's DISTINCT-VALUE
histogram plus tie-local row_numbers — so no window ever sees user-grain
cardinality for recency (bounded by the date range) or frequency (bounded
by distinct counts). Monetary is 1e-6-quantized money, whose histogram is
value-cardinality-bounded; at extreme user counts quantize to coarser
bands first (the operator's documented contract). Engine-exactness: the
metrics are exact ints / quantized sums, the order is made unique by the
user_id tiebreak, and the closed-form bucket reproduces NTILE bit-for-bit
(the oracle uses three plain NTILEs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ckpt import materialize
from ..operators.ntile import exact_ntile
from ..sources import load_table
from .catalog import _qsum
from .registry import declare


@declare(
    "rfm_user_segments",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS DATE) AS day, value FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    anchor AS (SELECT MAX(day) AS a FROM e),
    u AS (
      SELECT user_id,
             CAST(date_diff('day', MAX(day), (SELECT a FROM anchor)) AS INTEGER)
               AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             coalesce(CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS DOUBLE)
                      / 1000000.0, 0.0) AS monetary
      FROM e GROUP BY user_id),
    q AS (
      SELECT user_id, recency_days, frequency, monetary,
             CAST(NTILE(5) OVER (ORDER BY recency_days ASC, user_id) AS INTEGER)
               AS r_q,
             CAST(NTILE(5) OVER (ORDER BY frequency DESC, user_id) AS INTEGER)
               AS f_q,
             CAST(NTILE(5) OVER (ORDER BY monetary DESC, user_id) AS INTEGER)
               AS m_q
      FROM u)
    SELECT user_id, recency_days, frequency, monetary, r_q, f_q, m_q,
           'R' || r_q || 'F' || f_q || 'M' || m_q AS segment
    FROM q ORDER BY user_id
    """,
    doc="RFM segmentation: per user — days since last event (vs the corpus "
    "max day), event count, 1e-6-quantized value sum — each scored into "
    "global quintiles (1 = best: most recent / most frequent / highest "
    "value; user_id tiebreak) and concatenated into the 'R#F#M#' segment. "
    "One event-grain aggregate, a 1-row broadcast anchor fold, then three "
    "histogram-rank NTILEs over the user-grain table (operators/ntile.py "
    "— no corpus- or user-grain sort window; the oracle uses plain NTILE).",
)
def rfm_user_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    # day = floor(epoch_micros / day_micros), NOT to_date(ts): to_date on a
    # TIMESTAMP (LTZ) column follows spark.sql.session.timeZone, while the
    # streaming twin (streaming/funnel.py stream_rfm) folds ts_us // 86400e6
    # — UTC days. Deriving both surfaces from epoch micros makes
    # stream == batch timezone-independent BY CONSTRUCTION (r8 advice); for
    # the NTZ testdata the two forms are identical anyway, so the DuckDB
    # oracle (CAST(ts AS DATE) on naive timestamps) is unchanged.
    from ..functions.ts import epoch_micros

    day = F.floor(epoch_micros("ts") / F.lit(86_400_000_000)).cast("int")
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    anchor = e.agg(F.max(day).alias("_a"))
    u = (
        e.groupBy("user_id")
        .agg(
            F.max(day).alias("_last"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.coalesce(_qsum("value"), F.lit(0.0)).alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            (F.col("_a") - F.col("_last")).cast("int").alias("recency_days"),
            "frequency",
            "monetary",
        )
        # the user-grain table feeds three chained exact_ntile applications,
        # each consuming its input TWICE (histogram + rank join-back) — the
        # un-materialized event-grain aggregate subtree multiplies up to 2^3
        # copies in the plan and runtime reuse does not dedup the work above
        # the exchanges (measured: 5M-event stress, u alone 0.72 s vs the
        # full query 2.8-3.5 s). Materialize it once before the chain — the
        # refppl.py pre-ntile pattern (its `scored` checkpoint, same reason).
        # 5M-event interleaved A/B: 3.48/2.81 -> 2.13/2.23 s. The
        # materialization itself lives in rfm_from_metrics (r13 ADVICE: the
        # streaming twin fed an un-materialized user-grain table and paid
        # the same 2^3 plan-copy blowup; sharing the fold shares the fix).
    )
    return rfm_from_metrics(u)


def rfm_from_metrics(u: DataFrame) -> DataFrame:
    """The quintile/segment fold over a (user_id, recency_days, frequency,
    monetary) user-grain table — the ONE RFM scoring computation, shared by
    the batch query above and the streaming RFM state log
    (streaming/funnel.py rfm_report_from_log), so the two surfaces cannot
    drift.

    The input is materialized HERE (lazy; reliable checkpoint when a
    checkpoint dir is set, else DISK_ONLY localCheckpoint): the three
    chained exact_ntile applications each consume their input twice
    (histogram + rank join-back), so an un-materialized user-grain subtree
    multiplies up to 2^3 copies in the plan (measured r13: 5M-event stress,
    u alone 0.72 s vs the full query 2.8-3.5 s; A/B 3.48/2.81 -> 2.13/2.23
    s). Living in the shared fold, the fix covers the streaming twin too
    (r13 ADVICE: rfm_report_from_log previously fed an un-materialized
    emissions aggregate and paid the same blowup)."""
    u = materialize(u)
    q = exact_ntile(u, 5, "recency_days", "user_id", desc=False, out_col="r_q")
    q = exact_ntile(q, 5, "frequency", "user_id", desc=True, out_col="f_q")
    q = exact_ntile(q, 5, "monetary", "user_id", desc=True, out_col="m_q")
    return q.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        "r_q",
        "f_q",
        "m_q",
        F.concat(
            F.lit("R"), F.col("r_q"), F.lit("F"), F.col("f_q"),
            F.lit("M"), F.col("m_q"),
        ).alias("segment"),
    ).orderBy("user_id")
