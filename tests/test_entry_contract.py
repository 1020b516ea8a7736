"""Driver-contract regression tests: entry/queries/oracle_sql must work with a
session that has NONE of our factory configs (the driver supplies its own)."""

import importlib.util


def _load_entry():
    spec = importlib.util.spec_from_file_location("entry_mod", "/root/repo/__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_contract_shape():
    m = _load_entry()
    qs = m.queries()
    osql = m.oracle_sql()
    assert len(qs) >= 50
    assert set(osql) <= set(qs)  # every oracle key has a query
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in osql.values())
    # the driver's correctness gate checks the FIRST 50 registered queries:
    # every one of them must be oracle-backed, rows-only entries last — a
    # reorder that rotates an oracle query out of the checked prefix is a
    # silent coverage loss (round-3 verdict item 2/3)
    first_50 = list(qs)[:50]
    assert all(name in osql for name in first_50)


def test_entry_runs(spark):
    m = _load_entry()
    df = m.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["l_orderkey", "revenue", "o_orderdate", "o_orderpriority"]


def test_events_queries_survive_missing_nanos_conf(spark):
    """load_table must (re)set nanosAsLong itself — the driver's session won't
    have it and events.parquet carries INT64 TIMESTAMP(NANOS)."""
    m = _load_entry()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    try:
        n = m.queries()["tumbling_window_events"](spark, "/root/testdata/sf0.001").count()
        assert n > 0
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def test_driver_checked_prefix_order_is_frozen():
    """The driver's correctness gate hash-compares a bounded PREFIX of
    queries() and records per-position results round-over-round — so the
    oracle-backed entries must keep a deterministic, documented order. New
    oracle queries APPEND to the declaration order (declare them in a module
    imported AFTER every module below); declaring one in e.g. quality.py
    registers mid-list and silently renumbers everything after it (this
    happened within round 6: select_token_budget/lang_epoch_mix displaced
    the then-documented rows 59-60 to 61/63). `frozen` below is the
    DECLARATION order (extend it every time a query is appended); the
    exposed order is that list rotated left by registry.rotation(n) so the
    exposed order (round 12 onward) is: never-driver-checked oracle rows
    first (first hard verdict in the round they ship), then the
    already-checked rows rotated by the ceil(n/window) round-robin (round r
    starts at slot (r-1) % k, offset slot*window, wrapping) — see
    OPERATORS.md "Driver-prefix rotation". This test asserts the exact
    exposed order."""
    import __spark_entry__ as entry

    from hdfs2cass_spark.plans.registry import (
        DRIVER_PREFIX,
        ever_driver_checked,
        rotation,
    )

    frozen = [
        "cql_reshape_customer", "thrift_melt_nation", "token_route_customer",
        "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
        "grouping_analytics_orders", "distinct_users_per_type",
        "semi_anti_join_customers", "set_ops_distinct_and_bag",
        "full_outer_balance_cells", "window_rank_customers",
        "window_moving_avg_events", "topk_parts_by_price",
        "scalar_functions_part", "date_functions_orders", "json_extract_events",
        "tumbling_window_events", "counter_column_updates", "composite_key_hex",
        "pivot_order_status", "correlated_subquery_balance",
        "advanced_agg_functions", "asof_join_events", "sessionize_events_batch",
        "bulk_route_lineitem", "legacy_to_sinks_part",
        "avro_roundtrip_customer",  # round 11 (declared mid-catalog, next to S1's other rows)
        "thrift_by_convention",
        "range_join_events_windows", "salted_agg_events",
        "dedup_exact_documents", "text_analysis_documents",
        "ngram_jaccard_pairs", "minhash_lsh_pairs", "embedding_topk_cosine",
        "multimodal_features", "dedup_near_duplicates",
        "embedding_near_dup_pairs", "embedding_ivf_topk", "dedup_clusters",
        "simhash_near_dup_pairs", "corpus_select_split", "tfidf_top_terms",
        "decontamination_overlap", "pack_sequences", "top_ngram_repetition",
        "corpus_mix_quota", "exact_substring_spans", "chunk_documents",
        "curate_corpus", "text_embed_near_dup_pairs_md5",
        "embedding_dedup_clusters", "text_embed_dedup_clusters_md5",
        "bigram_logprob_score", "gopher_quality_filter",
        "lang_temperature_sample", "embedding_quantized_topk",
        "corpus_stats_report", "select_token_budget", "lang_epoch_mix",
        "rag_chunk_retrieval_md5", "embedding_label_stats",
        "curation_funnel", "events_value_outliers", "pack_fragments",
        "dsir_importance_weights", "dedup_against_reference",
        "decontamination_by_benchmark", "event_funnel_conversion",
        "cohort_retention", "funnel_time_to_convert",
        "event_transition_matrix", "gopher_line_rules",
        "c4_quality_filter", "bpe_token_counts",
        "token_fertility_by_lang",  # round 11 (declared next to its per-doc sibling)
        "gopher_paragraph_rules",
        "session_top_paths", "engagement_dau_wau",
        # round 8
        "quality_classifier_score", "rag_mmr_rerank_md5",
        "ref_perplexity_buckets", "rfm_user_segments",
        # round 9
        "exact_substring_word_spans", "exact_substring_scrub",
        "decontamination_scrub",  # round 11 (declared with its span-scrub siblings)
        # round 10
        "winnow_fingerprints", "winnow_candidate_pairs",
        "bloom_decontamination",
        # round 11
        "semantic_dedup", "ann_recall_report",
        # round 12
        "wav_audio_features", "jpeg_image_features",
        # round 13
        "gif_image_features",
    ]
    checked = ever_driver_checked()
    never = [n for n in frozen if n not in checked]
    rest = [n for n in frozen if n in checked]
    w = max(0, DRIVER_PREFIX - len(never))
    r = rotation(len(rest), window=w) % max(1, len(rest))
    expect = never + rest[r:] + rest[:r]
    names = list(entry.queries())
    assert names[: len(frozen)] == expect
    # a row declared this round has no committed driver verdict yet — it
    # must sit INSIDE the checked window in its own round (r9 review)
    assert set(never) <= set(names[:DRIVER_PREFIX])


def test_rotation_literal_pin():
    """r9 advice: the frozen-order test re-derives its expectation through
    the same registry helpers it is testing, so an ordering bug would
    reproduce identically in the expectation. This pins HAND-COMPUTED
    literals for fixed inputs — rotation() scalars and one full exposed
    ordering for a synthetic fixture — independent of the helpers' own
    arithmetic and of the live CORRECTNESS files."""
    from hdfs2cass_spark.plans.registry import rotation

    # 6 checked rows, window 4 -> k = ceil(6/4) = 2 windows: odd rounds
    # (slot 0) expose the earliest (rotation 0), even rounds (slot 1) start
    # at offset 4 and wrap. Literals, not math.
    assert rotation(6, round_no=9, window=4) == 0
    assert rotation(6, round_no=10, window=4) == 4
    assert rotation(6, round_no=11, window=4) == 0
    assert rotation(2, round_no=10, window=4) == 0  # window covers all
    # three-window case (the r11-verdict generalization): 10 rows, window 4
    # -> k = 3; rounds 12/13/14 start at slots 2/0/1 = offsets 8/0/4.
    assert rotation(10, round_no=12, window=4) == 8
    assert rotation(10, round_no=13, window=4) == 0
    assert rotation(10, round_no=14, window=4) == 4
    # composition rule: declaration order [a..f] all checked, plus g never
    # checked, fixture DRIVER_PREFIX 5 -> checked window w = 5 - 1 = 4;
    # even round (slot 1, offset 4) must expose exactly [g, e, f] then wrap
    # [a, b, c, d]
    order = ["a", "b", "c", "d", "e", "f"]
    r = rotation(len(order), round_no=10, window=4)
    exposed = ["g"] + order[r:] + order[:r]
    assert exposed == ["g", "e", "f", "a", "b", "c", "d"]


def test_rotation_round_robin_windows_cover_catalog():
    """The r8-verdict alternation guard, r11-verdict round-robin form:
    never-checked rows are always in the window; starting from ANY round,
    the next k = ceil(n_rest / w) windows over the checked rows must
    TOGETHER cover every oracle row — for the live catalog whatever its
    size, so this no longer fails when the catalog outgrows two windows."""
    import __spark_entry__ as entry

    from hdfs2cass_spark.plans.registry import (
        DRIVER_PREFIX,
        current_round,
        ever_driver_checked,
        rotation,
    )

    m = _load_entry()
    osql = m.oracle_sql()
    oracle_names = [n for n in m.queries() if n in osql]  # exposed order
    checked = ever_driver_checked()
    never = [q for q in oracle_names if q not in checked]
    rest = [q for q in oracle_names if q in checked]
    w = max(0, DRIVER_PREFIX - len(never))
    k = max(1, -(-len(rest) // max(1, w)))
    for start in (current_round(), current_round() + 1, current_round() + 2):
        windows = []
        for rnd in range(start, start + k):
            r = rotation(len(rest), round_no=rnd, window=w) % max(1, len(rest))
            exposed = never + rest[r:] + rest[:r]
            windows.append(set(exposed[:DRIVER_PREFIX]))
        covered = set().union(*windows)
        assert covered >= set(oracle_names), (
            f"{k} consecutive windows starting at round {start} no longer "
            "cover the catalog — rotation stride bug"
        )
    # slot semantics pinned: round r uses slot (r-1) % k
    assert rotation(len(rest), round_no=1, window=w) == 0
    assert rotation(len(rest), round_no=1 + k, window=w) == 0
    if k > 1:
        assert rotation(len(rest), round_no=2, window=w) == w % len(rest)
    # the driver's actual prefix this round is all-oracle and contains
    # every never-checked row
    names = list(entry.queries())
    assert all(name in osql for name in names[:DRIVER_PREFIX])
    assert set(never) <= set(names[:DRIVER_PREFIX])


def test_rotation_covers_for_arbitrary_catalog_sizes():
    """Synthetic coverage sweep (r11 verdict item 1 'extend the covering
    test to arbitrary n'): for a grid of catalog sizes and window budgets,
    any k = ceil(n/w) CONSECUTIVE rounds — at every starting round in a
    cycle-and-a-half — must cover all n rows; and a row's re-check gap
    never exceeds k rounds across a long horizon."""
    from hdfs2cass_spark.plans.registry import rotation

    for n in (1, 4, 49, 50, 51, 92, 100, 101, 149, 150, 151, 237):
        for w in (1, 7, 49, 50):
            k = -(-n // w)
            for start in range(1, 2 * k + 2):
                covered = set()
                for rnd in range(start, start + k):
                    r = rotation(n, round_no=rnd, window=w)
                    covered.update((r + i) % n for i in range(min(w, n)))
                assert covered == set(range(n)), (n, w, start)
            # max re-check gap over a 4-cycle horizon is k rounds
            last_seen = {i: 0 for i in range(n)}
            worst = 0
            for rnd in range(1, 4 * k + 1):
                r = rotation(n, round_no=rnd, window=w)
                for i in range(min(w, n)):
                    row = (r + i) % n
                    worst = max(worst, rnd - last_seen[row])
                    last_seen[row] = rnd
            assert worst <= k, (n, w, worst, k)
