"""Adversarial-input differential: the document queries run on a synthetic
table with NULL / empty / whitespace-only / unicode / control-char text and
must still match DuckDB exactly. The driver fixtures never exercise these,
which is how doc_fingerprint's NULL divergence survived round 1."""

import math
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hdfs2cass_spark.plans import CATALOG

DOC_QUERIES = [
    "dedup_exact_documents",  # absorbs dedup_normalized_keep_first (r4)
    "text_analysis_documents",  # absorbs quality/lang-id/fingerprint/array surface (r4)
    "ngram_jaccard_pairs",  # absorbs edit_distance_verify's edit80 (r4)
    "minhash_lsh_pairs",
    "dedup_near_duplicates",
    "dedup_clusters",
    "simhash_near_dup_pairs",
    "multimodal_features",
    "tfidf_top_terms",
    "corpus_select_split",  # absorbs train_test_split (r4)
    # round-3 pipeline stages
    "decontamination_overlap",
    "pack_sequences",
    "top_ngram_repetition",
    "corpus_mix_quota",
    "exact_substring_spans",  # new r4: only docs 8/9 reach the 8-word window
    "chunk_documents",  # new r4
    # round-6 quality/curation surface (documents-only)
    "bigram_logprob_score",
    "gopher_quality_filter",
    "lang_temperature_sample",
    "corpus_stats_report",
    "rag_chunk_retrieval_md5",
    "curation_funnel",
    "dsir_importance_weights",  # late r6: no 'src1' docs -> degenerate target
    "dedup_against_reference",  # late r6: docs 8(new)/9(ref) cross the split
    "decontamination_by_benchmark",
]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("edge_docs"))
    docs = pa.table(
        {
            "doc_id": pa.array(range(13), pa.int64()),
            "text": pa.array(
                [
                    None,
                    "",
                    "   ",
                    "one",
                    "one two three four",
                    "héllo wörld ünïcode tokens here",
                    "tab\tand\nnewline separated words here",
                    "one two three four",  # exact dup of doc 4
                    # docs 8/9: >= 8 words sharing a 10-word run, so
                    # exact_substring_spans produces non-empty output here
                    "pre1 r0 r1 r2 r3 r4 r5 r6 r7 r8 r9 post1",
                    "pre2 pre3 r0 r1 r2 r3 r4 r5 r6 r7 r8 r9",
                    # doc 10: planted PII — every scrub category fires, so the
                    # text_analysis differential exercises the actual rewrite
                    "mail me@x.io or http://a.b/c?d=1 ip 10.0.0.1 tel +1 555-123-4567 ok",
                    # doc 11: VERTICAL TAB adjacent to a space — Java \s
                    # includes \x0B, RE2 \s does not; the BPE-ish regex
                    # token count must use the explicit whitespace class or
                    # the engines diverge exactly here
                    "vertical\x0b tab\x0bsplit mixed\x0b\x0bruns end",
                    # doc 12: UNICODE spaces at the string edges and inside —
                    # DuckDB's bare trim() strips U+3000/U+2003 while Spark's
                    # strips only ASCII 0x20 (hence trim(x, ' ') in
                    # words_duck); neither engine's ASCII \s matches them
                    "　leading ideographic em gap nbsp end　",
                ],
                pa.string(),
            ),
            "lang": pa.array(["en"] * 13, pa.string()),
            "source": pa.array(
                ["sA", "sA", "sB", "sB", "sA", "sB", "sA", "sB", "sA", "sB",
                 "sA", "sB", "sA"],
                pa.string(),
            ),
            "n_chars": pa.array(
                [0, 0, 3, 3, 18, 31, 36, 18, 47, 48, 67, 35, 37], pa.int64()
            ),
        }
    )
    pq.write_table(docs, os.path.join(d, "documents.parquet"))
    return d


def _norm(v):
    if v is None:
        return ""
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return str(v)


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_doc_query_handles_edge_text(spark, edge_dir, name):
    q = CATALOG[name]
    sdf = q.fn(spark, edge_dir)
    cols = sorted(sdf.columns)
    srows = sorted(tuple(_norm(r[c]) for c in cols) for r in sdf.collect())

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{edge_dir}/documents.parquet')"
    )
    ores = con.execute(q.oracle).fetchall()
    ocols = [x[0] for x in con.description]
    oidx = [ocols.index(c) for c in sorted(ocols)]
    orows = sorted(tuple(_norm(r[i]) for i in oidx) for r in ores)
    assert sorted(ocols) == cols
    assert srows == orows


EVENT_QUERIES = [
    "json_extract_events",
    "tumbling_window_events",  # carries both window kinds since r4
    "window_moving_avg_events",
    "sessionize_events_batch",
    "asof_join_events",
    "distinct_users_per_type",
    # round-3 extension operators
    "range_join_events_windows",
    "salted_agg_events",
    "events_value_outliers",  # late round 6: NULL user/value rows excluded
    "event_funnel_conversion",  # late r6: no purchase events -> NULL-safe rate
    "cohort_retention",
    "funnel_time_to_convert",  # empty funnel -> empty result on both engines
    "event_transition_matrix",
    # round 7: NULL user/ts/event_type rows cannot take part in a path or
    # an active day (Spark sorts NULLs first, DuckDB last — unfiltered they
    # would session differently per engine)
    "session_top_paths",
    "engagement_dau_wau",
]


@pytest.fixture(scope="module")
def edge_events_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("edge_events"))
    S = 10**9
    base = 1704067200 * S
    # events 0-9 at 600 s spacing, EXCEPT two sub-second session-gap straddles:
    # user 2's second event lands 1799.5 s after its first (same session) and
    # user 3's last lands 1800.5 s after its predecessor (new session) — a
    # whole-second gap comparison misclassifies both against the oracle's
    # exact INTERVAL 30 MINUTE test.
    ts_ns = [base + i * 600 * S for i in range(10)]
    ts_ns[4] = ts_ns[3] + 1799 * S + S // 2
    ts_ns[9] = ts_ns[8] + 1800 * S + S // 2
    events = pa.table(
        {
            "event_id": pa.array(range(10), pa.int64()),
            "ts": pa.array(ts_ns, pa.timestamp("ns")),
            "user_id": pa.array([1, 1, 1, 2, 2, None, 3, 3, 3, 3], pa.int64()),
            "event_type": pa.array(
                ["click", "error", "click", "view", "error", None, "click", "click", "error", "click"],
                pa.string(),
            ),
            "value": pa.array([1.5, None, 2.5, 0.0, -1.25, 3.0, None, 4.5, 5.0, 6.25], pa.float64()),
            "props": pa.array(
                ['{"k": 1}', None, "", "not json", '{"k": null}', '{"x": 2}',
                 '{"k": "str"}', "{}", '{"k": 3.5}', "[1,2]"],
                pa.string(),
            ),
        }
    )
    pq.write_table(events, os.path.join(d, "events.parquet"))
    return d


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_event_query_handles_edge_rows(spark, edge_events_dir, name):
    """NULL users/types/values, malformed + non-numeric JSON — every events
    query must match DuckDB on inputs the fixtures never produce."""
    q = CATALOG[name]
    sdf = q.fn(spark, edge_events_dir)
    cols = sorted(sdf.columns)
    srows = sorted(tuple(_norm(r[c]) for c in cols) for r in sdf.collect())

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{edge_events_dir}/events.parquet')"
    )
    ores = con.execute(q.oracle).fetchall()
    ocols = [x[0] for x in con.description]
    oidx = [ocols.index(c) for c in sorted(ocols)]
    orows = sorted(tuple(_norm(r[i]) for i in oidx) for r in ores)
    assert sorted(ocols) == cols
    assert srows == orows


EMBEDDING_QUERIES = [
    "embedding_topk_cosine",
    "embedding_near_dup_pairs",
    "embedding_ivf_topk",
]


@pytest.fixture(scope="module")
def edge_emb_dir(tmp_path_factory):
    """Includes an all-zeros vector: norm 0 -> undefined cosine. ANSI-mode
    division THREW on it before the nullif guard; DuckDB yielded NaN/inf."""
    import random

    d = str(tmp_path_factory.mktemp("edge_emb"))
    random.seed(7)
    n = 12
    vecs = [
        [0.0] * 64 if i == 3 else [round(random.uniform(-1, 1), 4) for _ in range(64)]
        for i in range(n)
    ]
    emb = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([i % 3 for i in range(n)], pa.int32()),
        }
    )
    pq.write_table(emb, os.path.join(d, "embeddings.parquet"))
    return d


@pytest.mark.parametrize("name", EMBEDDING_QUERIES)
def test_embedding_query_handles_zero_vector(spark, edge_emb_dir, name):
    q = CATALOG[name]
    sdf = q.fn(spark, edge_emb_dir)
    cols = sorted(sdf.columns)
    srows = sorted(tuple(_norm(r[c]) for c in cols) for r in sdf.collect())

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{edge_emb_dir}/embeddings.parquet')"
    )
    ores = con.execute(q.oracle).fetchall()
    ocols = [x[0] for x in con.description]
    oidx = [ocols.index(c) for c in sorted(ocols)]
    orows = sorted(tuple(_norm(r[i]) for i in oidx) for r in ores)
    assert sorted(ocols) == cols
    assert srows == orows
