"""MMR-reranked retrieval (oracle row 80 + the production rows-only twin).

Plain top-k retrieval over an overlap-chunked corpus returns near-duplicate
chunks (adjacent chunks of one document share 3/4 of their words); every
production RAG stack therefore reranks with Maximal Marginal Relevance
(Carbonell & Goldstein 1998) or a cousin. This module declares the MMR
stage over the engine's existing retrieval (plans/rag.py) with the
oracle-twin discipline:

  - ``rag_mmr_rerank_md5`` (oracle-checked): md5 featurizer, top-C
    candidates from the proven retrieval chain, greedy lambda=0.5 MMR via
    ``operators/rerank.py mmr_rerank`` (applyInPandas per query group —
    the candidate set is bounded at C, so the group is a few KB). The
    DuckDB twin replays the greedy loop as a RECURSIVE CTE whose state is
    one row per query carrying the selected/remaining candidate LISTS —
    each step is pure list arithmetic (no windows or correlated subqueries
    in the recursive term). Engine-exactness: every comparison runs on
    floor(cos * 1e6 + 0.5) int64-quantized similarities with sequential
    double dot products — the argmax is exact in both engines, so the full
    greedy TRAJECTORY (not just the final set) hash-matches.
  - ``rag_mmr_rerank`` (rows-only): the xxhash64 production twin
    (the rag_chunk_retrieval / _md5 precedent).

100 TB shape: everything heavy happened upstream (map-only chunking, one
embed aggregate, broadcast query side, WindowGroupLimit top-C); the rerank
touches C rows per query in one Arrow batch per group and parallelizes
across queries. The greedy loop is O(K * C * dims) scalar work per query —
sequential by definition of MMR, bounded by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.rerank import mmr_rerank
from ..sources import load_table
from .rag import _N_QUERIES, _RAG_K, _retrieval_ctes, rag_retrieve_df
from .registry import declare

_MMR_C = 10  # candidate pool per query (top-C from retrieval)

# one quantized candidate-candidate similarity, inside the recursive term:
# sequential dot over the float32 embeddings (exact in both engines), zero-
# norm guarded, floor-quantized to int64 micro-units
_SIM_Q = (
    "CASE WHEN cnd.cn * s.cn = 0 THEN NULL ELSE "
    "CAST(floor((list_sum(list_transform(range(1, 65), i -> "
    "cnd.emb[i]::DOUBLE * s.emb[i]::DOUBLE)) / (cnd.cn * s.cn)) "
    "* 1000000 + 0.5) AS BIGINT) END"
)


@declare(
    "rag_mmr_rerank_md5",
    oracle=f"""
    WITH RECURSIVE {_retrieval_ctes(with_vec=True)},
    cands AS (
      SELECT q_id, doc_id, chunk_id,
             CAST(floor(cosine * 1000000 + 0.5) AS BIGINT) AS rq,
             cembedding AS emb, cn
      FROM ranked WHERE rnk <= {_MMR_C}),
    packed AS (
      SELECT q_id,
             list(struct_pack(did := doc_id, cid := chunk_id, rq := rq,
                              emb := emb, cn := cn)
                  ORDER BY doc_id, chunk_id) AS cs
      FROM cands GROUP BY q_id),
    sel AS (
      SELECT q_id, 1 AS step,
             [struct_pack(did := b.c.did, cid := b.c.cid, rq := b.c.rq,
                          sq := b.c.rq, emb := b.c.emb, cn := b.c.cn)] AS sel,
             list_filter(cs, r -> NOT (r.did = b.c.did AND r.cid = b.c.cid))
               AS rest
      FROM (SELECT q_id, cs,
              (list_sort(list_transform(cs, c ->
                 struct_pack(nk := -c.rq, did := c.did, cid := c.cid,
                             c := c))))[1] AS b
            FROM packed) t0
      UNION ALL
      SELECT q_id, step + 1,
             sel || [struct_pack(did := b.c.did, cid := b.c.cid,
                                 rq := b.c.rq, sq := -b.nk,
                                 emb := b.c.emb, cn := b.c.cn)],
             list_filter(rest, r -> NOT (r.did = b.c.did AND r.cid = b.c.cid))
      FROM (
        SELECT q_id, step, sel, rest,
          (list_sort(list_transform(rest, cnd -> struct_pack(
             nk := -(cnd.rq - coalesce(list_max(list_filter(
                      list_transform(sel, s -> {_SIM_Q}),
                      x -> x IS NOT NULL)), 0)),
             did := cnd.did, cid := cnd.cid, c := cnd))))[1] AS b
        -- stop when the pool runs dry: stepping on an empty rest would
        -- pad sel with NULL-field picks where the Spark loop stops early
        FROM sel WHERE step < {_RAG_K} AND len(rest) > 0) t
    ),
    final AS (
      SELECT q_id, sel FROM (
        SELECT q_id, sel,
               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY step DESC) AS rn
        FROM sel) t WHERE rn = 1),
    out AS (
      SELECT q_id, ord, sel[ord] AS e
      FROM final, LATERAL (SELECT unnest(generate_series(1, len(sel))) AS ord) o)
    SELECT q_id, e.did AS doc_id, e.cid AS chunk_id,
           CAST(e.rq AS DOUBLE) / 1000000.0 AS cosine,
           CAST(e.sq AS DOUBLE) / 2000000.0 AS mmr_score,
           CAST(ord AS INTEGER) AS sel_rank
    FROM out ORDER BY q_id, sel_rank
    """,
    doc=f"MMR-reranked retrieval (lambda = 0.5): top-{_MMR_C} md5-embedded "
    f"chunk candidates per query from the proven retrieval chain, then "
    f"greedy Maximal Marginal Relevance selects {_RAG_K} balancing "
    f"query relevance against similarity to the already-selected set — "
    f"the standard anti-redundancy stage over an overlap-chunked corpus. "
    f"applyInPandas per bounded query group; all comparisons on "
    f"int64-quantized similarities, so the DuckDB recursive-CTE twin "
    f"reproduces the greedy trajectory exactly.",
)
def rag_mmr_rerank_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cands = rag_retrieve_df(
        load_table(spark, sf_dir, "documents"),
        k=_MMR_C,
        n_queries=_N_QUERIES,
        hash_mode="md5",
        keep_vectors=True,
    )
    return mmr_rerank(cands, k=_RAG_K)


@declare(
    "rag_mmr_rerank",
    oracle=None,  # xxhash64 featurizer — no DuckDB twin; the md5 twin above hash-verifies the identical rerank machinery (the rag_chunk_retrieval precedent)
    doc="The production twin of rag_mmr_rerank_md5: identical candidate -> "
    "greedy-MMR pipeline with the JVM-native xxhash64 word hash. "
    "Rows-only checked by design; the diversity property (a planted "
    "near-duplicate candidate is demoted below a less-similar one) is "
    "asserted for both twins in tests/test_mmr.py.",
)
def rag_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    cands = rag_retrieve_df(
        load_table(spark, sf_dir, "documents"),
        k=_MMR_C,
        n_queries=_N_QUERIES,
        hash_mode="xxhash64",
        keep_vectors=True,
    )
    return mmr_rerank(cands, k=_RAG_K)
