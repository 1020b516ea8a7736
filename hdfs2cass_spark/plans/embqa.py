"""Embedding-quality assurance: per-label geometry report (oracle row 62).

Before an embedding table feeds ANN dedup or retrieval, a pipeline checks
its geometry: did the encoder collapse (all centroids near one point, tiny
dispersion)? Is a label polluted (low intra-label cohesion)? Are there
zero/degenerate vectors (min_vec_norm)? ``embedding_label_stats`` computes
that report — per label: count, centroid norm, average cosine of members
to their centroid (cohesion), dispersion (average squared distance to the
centroid), and the member-norm range.

Cross-engine exactness by construction: every vector component is
micro-quantized ONCE (q_d = floor(v_d * 1e6 + 0.5), exact int64 — the same
engine-neutral rounding as embedding_quantized_topk), and every statistic
is integer arithmetic over the q's followed by double divisions/sqrt of
identical operands in a FIXED expression order:

  - centroid_d      = S_d / (n * 1e6)          with S_d = SUM(q_d) exact
  - centroid_norm   = sqrt(sum_d centroid_d^2) generated 64-term literal
  - cos(v, c)       = (sum_d q_d * S_d) / (|q| * |S|) — integer dot; the
                      1e6 scale factors cancel
  - dispersion      = E||v||^2 - ||c||^2       (the variance identity;
                      E||v||^2 from per-vec integer sq-norms summed as
                      DECIMAL(38,0) so the label-level sum never wraps)

Integer-range bounds (documented, not silent): |q_d| <= ~1e6 for unit-ish
embeddings, so the per-vec cos numerator sum_d q_d*S_d stays in int64 while
a label holds <= ~1.4e5 vectors; past that, switch the dot to the same
DECIMAL accumulation as the sq-norm sum (the _dec precedent in
plans/catalog.py). The centroid-norm terms (S_d^2) are computed as
fixed-order DOUBLE multiply-adds, not int64 products, so they carry no
integer bound at all (an int64 S_d*S_d would wrap at only ~3e3 cohesive
vectors per label — the degenerate case this report exists to catch). Scale shape: one wide per-label aggregate (64 dim-sums,
map-side combined), the 10-row label table broadcast back over one more
scan for the cosine pass — the corpus is never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .registry import declare

_DIMS = 64
_Q = 1_000_000  # micro-quantization scale


def _gen(fmt: str, sep: str = " + ") -> str:
    return sep.join(fmt.format(i=i) for i in range(1, _DIMS + 1))


# Spark fragments -----------------------------------------------------------
_QV_SPARK = (
    f"transform(sequence(1, {_DIMS}), i -> CAST(floor("
    f"CAST(element_at(embedding, i) AS DOUBLE) * {_Q}.0 + 0.5d) AS BIGINT))"
)
_SQ_SPARK = "aggregate(qv, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"
# centroid norm over the 64 S_d columns (S_d = SUM of q_d), fixed order
_CNORM_SPARK = (
    "sqrt(" + _gen("(CAST(s{i} AS DOUBLE) / (CAST(n_vecs AS DOUBLE) * 1000000.0)) "
                   "* (CAST(s{i} AS DOUBLE) / (CAST(n_vecs AS DOUBLE) * 1000000.0))")
    + ")"
)
# NB: each term is cast to DOUBLE BEFORE the multiply — s_i can reach
# n * 1e6, so the int64 product s_i*s_i would wrap at n ~ 3e3 cohesive
# vectors per label (exactly the encoder-collapse case this report
# detects). Fixed left-to-right double adds keep both engines identical.
_SNORM_SPARK = "sqrt(" + _gen("CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE)") + ")"
_DOT_QS_SPARK = (
    "aggregate(zip_with(qv, sv, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
)

# DuckDB fragments ----------------------------------------------------------
_QV_DUCK = (
    f"list_transform(range(1, {_DIMS + 1}), i -> CAST(floor("
    f"embedding[i]::DOUBLE * {_Q}.0 + 0.5) AS BIGINT))"
)
_SQ_DUCK = "CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT)"
_SUMS_DUCK = ", ".join(f"CAST(SUM(qv[{i}]) AS BIGINT) AS s{i}" for i in range(1, _DIMS + 1))
_CNORM_DUCK = (
    "sqrt(" + _gen("(CAST(s{i} AS DOUBLE) / (CAST(n_vecs AS DOUBLE) * 1000000.0)) "
                   "* (CAST(s{i} AS DOUBLE) / (CAST(n_vecs AS DOUBLE) * 1000000.0))")
    + ")"
)
_SNORM_DUCK = "sqrt(" + _gen("CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE)") + ")"
_SV_DUCK = "[" + ", ".join(f"s{i}" for i in range(1, _DIMS + 1)) + "]"
_DOT_QS_DUCK = (
    f"CAST(list_sum(list_transform(range(1, {_DIMS + 1}), i -> qv[i] * sv[i])) AS BIGINT)"
)


@declare(
    "embedding_label_stats",
    oracle=f"""
    WITH qv AS (
      SELECT vec_id, label, {_QV_DUCK} AS qv
      FROM embeddings WHERE embedding IS NOT NULL),
    pv AS (SELECT vec_id, label, qv, {_SQ_DUCK} AS sq FROM qv),
    lab AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
             CAST(SUM(CAST(sq AS DECIMAL(38, 0))) AS DECIMAL(38, 0)) AS sum_sq,
             CAST(MIN(sqrt(CAST(sq AS DOUBLE)) / {_Q}.0) AS DOUBLE) AS min_vec_norm,
             CAST(MAX(sqrt(CAST(sq AS DOUBLE)) / {_Q}.0) AS DOUBLE) AS max_vec_norm,
             {_SUMS_DUCK}
      FROM pv GROUP BY label),
    cosq AS (
      SELECT p.label,
             CAST(floor(CAST({_DOT_QS_DUCK} AS DOUBLE)
               / nullif(sqrt(CAST(p.sq AS DOUBLE)) * l.snorm, 0.0)
               * {_Q}.0 + 0.5) AS BIGINT) AS qcos
      FROM pv p JOIN (SELECT label, {_SV_DUCK} AS sv, {_SNORM_DUCK} AS snorm
                      FROM lab) l USING (label)),
    coh AS (
      SELECT label, CAST(SUM(qcos) AS BIGINT) AS sum_qcos,
             CAST(COUNT(qcos) AS BIGINT) AS n_cos
      FROM cosq GROUP BY label)
    SELECT label, n_vecs,
           round({_CNORM_DUCK}, 6) AS centroid_norm,
           round(CAST(sum_qcos AS DOUBLE) / n_cos / {_Q}.0, 6) AS avg_cos_to_centroid,
           round(greatest(
             CAST(sum_sq AS DOUBLE) / (CAST(n_vecs AS DOUBLE) * 1000000000000.0)
             - ({_CNORM_DUCK}) * ({_CNORM_DUCK}), 0.0) + 0.0, 6) AS dispersion,
           round(min_vec_norm, 6) AS min_vec_norm,
           round(max_vec_norm, 6) AS max_vec_norm
    FROM lab JOIN coh USING (label)
    ORDER BY label
    """,
    doc="Embedding-QA report per label: member count, centroid norm, "
    "intra-label cohesion (average cosine of members to their centroid), "
    "dispersion (variance identity E||v||^2 - ||c||^2), and the member-norm "
    "range — the checks that catch encoder collapse, label pollution, and "
    "degenerate vectors before an embedding table feeds ANN. All statistics "
    "are exact integer arithmetic over once-micro-quantized components with "
    "fixed-order double finishes, so the oracle hash is exact. One wide "
    "map-side-combined label aggregate + a broadcast-back cosine pass; the "
    "corpus is never shuffled.",
)
def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    pv = e.select(
        "vec_id", "label", F.expr(_QV_SPARK).alias("qv")
    ).withColumn("sq", F.expr(_SQ_SPARK))
    lab = pv.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum(F.col("sq").cast("decimal(38,0)")).cast("decimal(38,0)").alias("sum_sq"),
        F.min(F.expr(f"sqrt(CAST(sq AS DOUBLE)) / {_Q}.0")).cast("double").alias("min_vec_norm"),
        F.max(F.expr(f"sqrt(CAST(sq AS DOUBLE)) / {_Q}.0")).cast("double").alias("max_vec_norm"),
        *[
            F.sum(F.expr(f"element_at(qv, {i})")).cast("bigint").alias(f"s{i}")
            for i in range(1, _DIMS + 1)
        ],
    )
    lab_sv = lab.withColumn(
        "sv", F.array(*[F.col(f"s{i}") for i in range(1, _DIMS + 1)])
    ).withColumn("snorm", F.expr(_SNORM_SPARK))
    cosq = (
        pv.join(F.broadcast(lab_sv.select("label", "sv", "snorm")), "label")
        .select(
            "label",
            F.expr(
                f"CAST(floor(CAST({_DOT_QS_SPARK} AS DOUBLE)"
                f" / nullif(sqrt(CAST(sq AS DOUBLE)) * snorm, CAST(0 AS DOUBLE))"
                f" * {_Q}.0 + 0.5d) AS BIGINT)"
            ).alias("qcos"),
        )
    )
    coh = cosq.groupBy("label").agg(
        F.sum("qcos").cast("bigint").alias("sum_qcos"),
        F.count("qcos").cast("bigint").alias("n_cos"),
    )
    cnorm = F.expr(_CNORM_SPARK)
    return (
        lab.join(coh, "label")
        .select(
            "label",
            "n_vecs",
            F.round(cnorm, 6).alias("centroid_norm"),
            F.round(
                F.col("sum_qcos").cast("double") / F.col("n_cos") / F.lit(float(_Q)), 6
            ).alias("avg_cos_to_centroid"),
            F.round(
                F.greatest(
                    F.col("sum_sq").cast("double")
                    / (F.col("n_vecs").cast("double") * 1000000000000.0)
                    - cnorm * cnorm,
                    F.lit(0.0),
                )
                + 0.0,
                6,
            ).alias("dispersion"),
            F.round("min_vec_norm", 6).alias("min_vec_norm"),
            F.round("max_vec_norm", 6).alias("max_vec_norm"),
        )
        .orderBy("label")
    )
