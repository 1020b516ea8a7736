"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
"Winnowing: Local Algorithms for Document Fingerprinting", the MOSS
algorithm) + the candidate-pair matching stage built on them.

Winnowing selects a deterministic, position-robust SUBSET of a document's
k-gram hashes: slide a window of WINNOW_W consecutive gram hashes and keep
the minimum of each window (leftmost position on ties — pinned identically
in both engines). Guarantees: any shared substring of at least
SUBSTR_K + WINNOW_W - 1 words produces at least one shared fingerprint
(the paper's theorem 1), while the expected density is only
2/(WINNOW_W + 1) of all grams — the classic fingerprint-vs-coverage dial.

Relation to the neighbors in this engine: the exact-substring family
(plans/pipeline.py, plans/spans.py) keeps EVERY gram (exact spans, big
index); minhash (plans/llm.py) keeps a similarity SKETCH (whole-doc
Jaccard, no positions). Winnowing sits between them: positional evidence
like the gram table at a fraction of its size — the right index for
"which documents share a passage with this one" at corpus scale.

100 TB shape: fingerprint selection is MAP-ONLY (one scan, higher-order
functions over the per-doc gram-hash array — no explode of unselected
grams, no shuffle); the pair stage groups the selected fingerprints by
hash through the capped-bucket gate (operators/buckets.py — count before
collect, hot boilerplate fingerprints dropped before any buffer fills)
and expands pairs only inside surviving buckets.

Reference framing: the reference has no fingerprinting surface
(SURVEY.md §2.2) — extension surface for the training-data pipeline,
sharing the exact-substring family's gram arithmetic (SUBSTR_K,
hash60) so fingerprints are comparable across the two indexes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.buckets import capped_buckets
from ..sources.readers import load_table
from .llm import W_DUCK, W_SPARK, hash60_duck, hash60_spark
from .pipeline import SUBSTR_K
from .registry import declare

WINNOW_W = 4  # gram hashes per winnowing window (density ~ 2/(W+1))
PAIR_CAP = 100  # capped-bucket gate for the pair stage (BAND_CAP class)

# per-doc gram-hash array: the SAME SUBSTR_K-word gram + hash60 arithmetic
# as substring_gram_positions, kept as an ARRAY (winnowing selects from it
# in place; the unselected grams are never exploded into rows)
_HS_SPARK = (
    f"transform(sequence(1, size(ws) - {SUBSTR_K - 1}), i -> "
    + hash60_spark(f"concat_ws(' ', slice(ws, i, {SUBSTR_K}))")
    + ")"
)
_HS_DUCK = (
    f"list_transform(generate_series(1, len(ws) - {SUBSTR_K - 1}), i -> "
    + hash60_duck(f"array_to_string(list_slice(ws, i, i + {SUBSTR_K - 1}), ' ')")
    + ")"
)

# window-minimum selection, leftmost position on ties: for window j the
# selected gram is (j - 1 + first position of the window's min hash). Docs
# with fewer than WINNOW_W grams form one whole-doc window (slice clamps
# past the end in both engines); array_distinct collapses the same gram
# selected by adjacent windows.
_SEL_SPARK = (
    f"array_distinct(transform(sequence(1, greatest(1, size(hs) - {WINNOW_W - 1})), "
    f"j -> named_struct("
    f"'pos', CAST(j - 1 + array_position(slice(hs, j, {WINNOW_W}), "
    f"array_min(slice(hs, j, {WINNOW_W}))) AS INT), "
    f"'h', array_min(slice(hs, j, {WINNOW_W})))))"
)
# no list_distinct here: DuckDB's list_distinct is histogram-based and
# unimplemented for STRUCT elements — the oracle dedupes after the unnest
# (SELECT DISTINCT), same result; Spark keeps the in-array array_distinct
# so its side stays map-only
_SEL_DUCK = (
    f"list_transform(generate_series(1, greatest(1, len(hs) - {WINNOW_W - 1})), "
    f"j -> {{'pos': CAST(j - 1 + list_position(list_slice(hs, j, j + {WINNOW_W - 1}), "
    f"list_min(list_slice(hs, j, j + {WINNOW_W - 1}))) AS INTEGER), "
    f"'h': list_min(list_slice(hs, j, j + {WINNOW_W - 1}))}})"
)

_FP_CTE_DUCK = f"""
    w AS (SELECT doc_id, {W_DUCK} AS ws FROM documents WHERE text IS NOT NULL),
    g AS (SELECT doc_id, {_HS_DUCK} AS hs FROM w WHERE len(ws) >= {SUBSTR_K}),
    sel AS (SELECT doc_id, unnest({_SEL_DUCK}) AS u FROM g),
    fp AS (SELECT DISTINCT doc_id, u.pos AS pos, u.h AS h FROM sel)"""


def winnow_fingerprints_df(d: DataFrame) -> DataFrame:
    """(doc_id, pos, h): the selected fingerprints — map-only, one scan."""
    return (
        d.filter(F.col("text").isNotNull())
        .select("doc_id", F.expr(W_SPARK).alias("ws"))
        .filter(F.expr(f"size(ws) >= {SUBSTR_K}"))
        .select("doc_id", F.expr(_HS_SPARK).alias("hs"))
        .select("doc_id", F.explode(F.expr(_SEL_SPARK)).alias("u"))
        .select("doc_id", F.col("u.pos").alias("pos"), F.col("u.h").alias("h"))
    )


@declare(
    "winnow_fingerprints",
    oracle=f"""
    WITH {_FP_CTE_DUCK}
    SELECT doc_id, pos, h FROM fp ORDER BY doc_id, pos
    """,
    doc=f"Winnowing fingerprint selection (Schleimer et al. 2003, the MOSS "
    f"algorithm): per document, the minimum gram hash of every window of "
    f"{WINNOW_W} consecutive {SUBSTR_K}-word gram hashes (leftmost position "
    f"on ties), deduplicated — a position-robust ~2/{WINNOW_W + 1} density "
    f"subset that still guarantees a shared fingerprint for any shared "
    f"substring of >= {SUBSTR_K + WINNOW_W - 1} words. Same gram arithmetic "
    f"as the exact-substring family (hash60 over {SUBSTR_K}-word windows). "
    f"100 TB shape: MAP-ONLY — higher-order functions select from the "
    f"per-doc gram-hash array in place; unselected grams are never exploded "
    f"into rows and nothing shuffles.",
)
def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winnow_fingerprints_df(load_table(spark, sf_dir, "documents")).orderBy(
        "doc_id", "pos"
    )


@declare(
    "winnow_candidate_pairs",
    oracle=f"""
    WITH {_FP_CTE_DUCK},
    dfp AS (SELECT DISTINCT doc_id, h FROM fp),
    kept AS (
      SELECT h FROM dfp GROUP BY h HAVING COUNT(*) BETWEEN 2 AND {PAIR_CAP}
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM dfp a JOIN dfp b ON a.h = b.h AND a.doc_id < b.doc_id
      JOIN kept k ON k.h = a.h
    )
    SELECT doc_a, doc_b, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM pairs GROUP BY doc_a, doc_b
    HAVING COUNT(*) >= 2
    ORDER BY doc_a, doc_b
    """,
    doc=f"Winnowing candidate pairs (the MOSS matching stage): documents "
    f"sharing >= 2 distinct selected fingerprints, with the shared count — "
    f"positional plagiarism/near-dup candidates at fingerprint (not full "
    f"gram-table) cost. 100 TB shape: the selected fingerprints group by "
    f"hash through the capped-bucket gate (count BEFORE collect, buckets "
    f"over {PAIR_CAP} docs — boilerplate passages — dropped before any "
    f"buffer fills), pairs expand only inside surviving buckets, and the "
    f"final per-pair count is one map-side-combined aggregate. No "
    f"all-pairs stage exists at any skew.",
)
def winnow_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    fp = winnow_fingerprints_df(load_table(spark, sf_dir, "documents"))
    dfp = fp.select("doc_id", "h").distinct()
    buckets = capped_buckets(dfp, ["h"], "doc_id", cap=PAIR_CAP)
    pair_expr = (
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids) - i - 1), y -> "
        "struct(x AS doc_a, y AS doc_b))))"
    )
    return (
        buckets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
        .orderBy("doc_a", "doc_b")
    )
