"""Late-registered report/ops queries (oracle rows 63-65).

The driver's correctness gate hash-compares a bounded PREFIX of queries()
(the registry sorts oracle-backed entries by module import order), so a new
oracle query must APPEND to the checked set, never insert mid-list and
displace rows the driver already recorded green. A new oracle query
therefore belongs in whichever plans module plans/__init__.py imports LAST
(the import marked "keep LAST" there — dsir and crossdedup registered after
this module in round 6), wherever its implementation naturally sits:

  - curation_funnel (implementation in plans/compose.py next to the chain
    it reports on)
  - events_value_outliers (the events-family ops sweep)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .compose import CTE_CHAIN, curation_funnel as _curation_funnel
from .llm import W_DUCK
from .registry import declare

declare(
    "curation_funnel",
    oracle=f"""{CTE_CHAIN},
    counts AS (
      SELECT 0 AS stage_id, 'input' AS stage,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM base) AS n_docs
      UNION ALL SELECT 1, 'quality', (SELECT CAST(COUNT(*) AS BIGINT) FROM q)
      UNION ALL SELECT 2, 'exact_dedup', (SELECT CAST(COUNT(*) AS BIGINT) FROM dd)
      UNION ALL SELECT 3, 'near_dup', (SELECT CAST(COUNT(*) AS BIGINT) FROM nd)
      UNION ALL SELECT 4, 'decontam', (SELECT CAST(COUNT(*) AS BIGINT) FROM clean))
    SELECT CAST(stage_id AS INTEGER) AS stage_id, stage, n_docs,
           CAST(coalesce(lag(n_docs) OVER (ORDER BY stage_id) - n_docs, 0) AS BIGINT)
             AS n_dropped,
           round(CAST(n_docs AS DOUBLE)
                 / first_value(n_docs) OVER (ORDER BY stage_id), 6) AS retention
    FROM counts ORDER BY stage_id
    """,
    doc="Curation observability: the per-stage funnel of the curate_corpus "
    "chain — docs surviving each of input -> quality -> exact-dedup -> "
    "near-dup -> decontam, with per-stage drop counts and retention vs "
    "input. The report every production curation run publishes next to its "
    "output (and the first thing an operator reads when a corpus shrinks "
    "unexpectedly). Shares the EXACT stage definitions with curate_corpus "
    "(curate_stage_dfs / CTE_CHAIN), so the numbers are the chain's real "
    "numbers, not a parallel implementation's. Each stage reduces to a "
    "1-row count aggregate (map-side combined); the exact-dedup survivors "
    "are localCheckpointed so upstream stages do not re-run per count; the "
    "final lag/retention window runs over 5 rows.",
)(_curation_funnel)

# ---------------------------------------------------------------------------
# Per-user outlier detection (exact quantized moments)
# ---------------------------------------------------------------------------

_Z_THRESHOLD = 1.5  # |z| tail to report; production ops tune this per metric


@declare(
    "events_value_outliers",
    oracle=f"""
    WITH q AS (
      SELECT event_id, user_id, value,
             CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS qv
      FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
    s AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_user,
             CAST(SUM(qv) AS BIGINT) AS sq,
             CAST(SUM(CAST(qv AS DECIMAL(38, 0)) * qv) AS DECIMAL(38, 0)) AS sqq
      FROM q GROUP BY user_id),
    m AS (
      SELECT user_id, n_user,
             CAST(sq AS DOUBLE) / n_user / 1000000.0 AS mu,
             sqrt((greatest(CAST(sqq AS DOUBLE) / n_user
                            - (CAST(sq AS DOUBLE) / n_user)
                              * (CAST(sq AS DOUBLE) / n_user), 0.0) + 0.0)
                  / 1000000000000.0) AS sigma
      FROM s)
    SELECT event_id, q.user_id, value,
           round((CAST(qv AS DOUBLE) / 1000000.0 - mu) / nullif(sigma, 0.0), 6) AS z,
           round(mu, 6) AS user_mean, round(sigma, 6) AS user_std, n_user
    FROM q JOIN m ON q.user_id = m.user_id
    WHERE abs((CAST(qv AS DOUBLE) / 1000000.0 - mu) / nullif(sigma, 0.0))
          >= {_Z_THRESHOLD}
    ORDER BY event_id
    """,
    doc=f"Per-user outlier detection over the events stream: each user's "
    f"value distribution summarized by EXACT quantized moments (micro-int "
    f"sums; the squared sum accumulates as DECIMAL(38,0) so it never wraps "
    f"at any event count), then every event z-scored against its user and "
    f"the |z| >= {_Z_THRESHOLD} tail reported — the metrics-anomaly sweep "
    f"an ops pipeline runs over behavioral telemetry. Engine-exact: "
    f"variance from the fixed-order moment identity on exact integers "
    f"(greatest(...)+0.0 guards the constant-series negative-epsilon and "
    f"-0.0), z from identical-operand doubles. Scale shape: one map-side- "
    f"combined per-user aggregate, stats broadcast back over one scan — "
    f"the event table never shuffles.",
)
def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    q = e.filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    ).select(
        "event_id",
        "user_id",
        "value",
        F.floor(F.col("value") * 1000000.0 + 0.5).cast("bigint").alias("qv"),
    )
    s = q.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_user"),
        F.sum("qv").cast("bigint").alias("sq"),
        F.sum(F.col("qv").cast("decimal(38,0)") * F.col("qv"))
        .cast("decimal(38,0)")
        .alias("sqq"),
    )
    mu = F.col("sq").cast("double") / F.col("n_user") / 1000000.0
    mean_q = F.col("sq").cast("double") / F.col("n_user")
    sigma = F.sqrt(
        (
            F.greatest(
                F.col("sqq").cast("double") / F.col("n_user") - mean_q * mean_q,
                F.lit(0.0),
            )
            + 0.0
        )
        / 1000000000000.0
    )
    m = s.select("user_id", "n_user", mu.alias("mu"), sigma.alias("sigma"))
    z = (F.col("qv").cast("double") / 1000000.0 - F.col("mu")) / F.expr(
        "nullif(sigma, CAST(0 AS DOUBLE))"
    )
    return (
        q.join(F.broadcast(m), "user_id")
        .filter(F.abs(z) >= _Z_THRESHOLD)
        .select(
            "event_id",
            "user_id",
            "value",
            F.round(z, 6).alias("z"),
            F.round("mu", 6).alias("user_mean"),
            F.round("sigma", 6).alias("user_std"),
            "n_user",
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Fragment-level sequence packing
# ---------------------------------------------------------------------------


@declare(
    "pack_fragments",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, CAST(len({W_DUCK}) AS BIGINT) AS n_tokens
      FROM documents),
    p AS (
      SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS start_offset
      FROM toks),
    f AS (
      SELECT doc_id, n_tokens, start_offset,
             unnest(generate_series(start_offset // 256,
                                    (start_offset + n_tokens - 1) // 256)) AS seq_id
      FROM p WHERE n_tokens >= 1)
    SELECT doc_id, CAST(seq_id AS BIGINT) AS seq_id,
           CAST(greatest(start_offset, seq_id * 256) - start_offset AS BIGINT)
             AS doc_off,
           CAST(greatest(start_offset, seq_id * 256) - seq_id * 256 AS BIGINT)
             AS seq_off,
           CAST(least(start_offset + n_tokens, (seq_id + 1) * 256)
                - greatest(start_offset, seq_id * 256) AS BIGINT) AS frag_len
    FROM f ORDER BY seq_id, seq_off
    """,
    doc="Fragment-level sequence packing — the concat-and-split layout LLM "
    "pretraining actually trains on: every token of the packed corpus lands "
    "in EXACTLY ONE fixed-size training sequence, and a document straddling "
    "a boundary is emitted once per spanned sequence with its in-doc and "
    "in-sequence offsets. Pure integer arithmetic downstream of "
    "pack_sequences' distributed prefix-sum: the 1->#spanned-seqs explode "
    "is a map-side sequence() Generate, nothing new shuffles. Completes "
    "the packing family: pack_sequences places docs, this materializes the "
    "(seq_id, seq_off, doc_id, doc_off, frag_len) gather lists a training "
    "dataloader consumes.",
)
def pack_fragments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline import PACK_BUDGET, pack_sequences

    B = PACK_BUDGET
    p = pack_sequences(spark, sf_dir).filter(F.col("n_tokens") >= 1)
    f = p.select(
        "doc_id",
        "n_tokens",
        "start_offset",
        F.explode(
            F.expr(f"sequence(start_offset div {B}, (start_offset + n_tokens - 1) div {B})")
        ).alias("sid"),
    )
    frag_start = F.greatest(F.col("start_offset"), F.col("sid") * B)
    frag_end = F.least(F.col("start_offset") + F.col("n_tokens"), (F.col("sid") + 1) * B)
    return f.select(
        "doc_id",
        F.col("sid").cast("bigint").alias("seq_id"),
        (frag_start - F.col("start_offset")).cast("bigint").alias("doc_off"),
        (frag_start - F.col("sid") * B).cast("bigint").alias("seq_off"),
        (frag_end - frag_start).cast("bigint").alias("frag_len"),
    ).orderBy("seq_id", "seq_off")
