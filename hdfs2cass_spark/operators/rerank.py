"""MMR (Maximal Marginal Relevance) reranking over retrieval candidates.

The standard retrieval-diversity stage (Carbonell & Goldstein 1998, public):
plain top-k by cosine returns near-duplicate chunks when a document is
chunked with overlap; MMR greedily selects k results balancing relevance to
the query against similarity to the already-selected set —
``argmax_c  lambda * rel(q, c) - (1 - lambda) * max_{s in sel} sim(c, s)``.

Spark shape: the greedy loop is inherently sequential PER QUERY but the
candidate set is BOUNDED (top-C from the retrieval stage, C ~ 10-50), so the
right primitive is ``applyInPandas`` over query groups — each group is a
few-KB pandas frame, the selection is O(K * C * dims) scalar work, and
queries parallelize across executors. No corpus data ever enters the group:
candidates were already truncated by the retrieval's WindowGroupLimit.

Cross-engine exactness (so a DuckDB recursive-CTE twin can hash-match): all
comparisons run on INTEGER-quantized similarities — ``floor(cos * 1e6 +
0.5)`` as int64, the house floor-quantize recipe (plans/quality.py header)
that sidesteps engine round() semantics — and every cosine is computed with
the sequential left-to-right double arithmetic the list_sum oracles pin
(plain Python loops here, NOT numpy: np.dot's pairwise/SIMD summation
rounds differently than sequential adds). With lambda = 0.5 the score
order equals ``rel_q - maxsim_q`` on integers, ties break on
(doc_id, chunk_id) — argmax is then exact in both engines by construction.

The closure is self-contained (the streaming/stateful.py contract): it
imports only installed packages, so it ships to executors that do not have
this repository on PYTHONPATH.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

Q6 = 1_000_000  # similarity quantization (6 decimal places)


def mmr_rerank(
    cands: DataFrame,
    k: int = 5,
    q_col: str = "q_id",
    id_cols: tuple[str, str] = ("doc_id", "chunk_id"),
    rel_col: str = "cosine",
    vec_col: str = "cembedding",
) -> DataFrame:
    """Greedy MMR (lambda = 0.5) over per-query candidate frames.

    ``cands``: (q_col, *id_cols, rel_col, vec_col) with a BOUNDED number of
    rows per query (the retrieval top-C). Returns one row per selected
    candidate: (q_col, *id_cols, cosine, mmr_score, sel_rank) where
    ``cosine`` is the quantized relevance (rel_q / 1e6 — bit-identical to
    the retrieval's round(cos, 6)), ``mmr_score`` = (rel_q - maxsim_q) /
    2e6 (the lambda = 0.5 score), and ``sel_rank`` is the 1-based selection
    order."""
    d1, d2 = id_cols
    out_schema = (
        f"{q_col} long, {d1} long, {d2} int, "
        "cosine double, mmr_score double, sel_rank int"
    )
    kk = int(k)
    q6 = Q6

    def rerank(pdf):
        import math

        import pandas as pd

        rows = []
        for _, r in pdf.iterrows():
            emb = [float(x) for x in r[vec_col]]
            nrm = 0.0
            for x in emb:
                nrm = nrm + x * x
            rows.append(
                {
                    "did": int(r[d1]),
                    "cid": int(r[d2]),
                    # quantize the (already rounded) relevance: the value is
                    # within ~1e-10 of an integer multiple of 1e-6, so the
                    # +0.5 floor recovers that integer exactly
                    "rq": int(math.floor(float(r[rel_col]) * q6 + 0.5)),
                    "emb": emb,
                    "cn": math.sqrt(nrm),
                }
            )
        selected = []
        out = []
        while rows and len(selected) < kk:
            best = None
            for c in rows:
                sims = []
                for s in selected:
                    den = c["cn"] * s["cn"]
                    if den == 0:
                        continue
                    dot = 0.0
                    for x, y in zip(c["emb"], s["emb"]):  # sequential, exact
                        dot = dot + x * y
                    sims.append(int(math.floor((dot / den) * q6 + 0.5)))
                msq = max(sims) if sims else 0
                key = (-(c["rq"] - msq), c["did"], c["cid"])
                if best is None or key < best[0]:
                    best = (key, c)
            _, c = best
            rows = [r for r in rows if not (r["did"] == c["did"] and r["cid"] == c["cid"])]
            selected.append(c)
            out.append(
                {
                    q_col: int(pdf[q_col].iloc[0]),
                    d1: c["did"],
                    d2: c["cid"],
                    "cosine": c["rq"] / float(q6),
                    "mmr_score": -best[0][0] / float(2 * q6),
                    "sel_rank": len(selected),
                }
            )
        return pd.DataFrame(out)

    return (
        cands.groupBy(q_col)
        .applyInPandas(rerank, out_schema)
        .orderBy(q_col, "sel_rank")
    )
