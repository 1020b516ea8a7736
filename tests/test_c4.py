"""Planted-document semantics for the C4 heuristics and the BPE-ish token
counter (plans/c4.py) — each C4 rule trips on exactly the doc planted for
it, the BPE lexer counts what a real pre-tokenizer would, and the SAME
oracle SQL agrees with the Spark plan on the planted multi-line docs."""

import duckdb
import pandas as pd
import pytest

from hdfs2cass_spark.plans.c4 import bpe_token_counts, c4_filter_df
from hdfs2cass_spark.plans.registry import CATALOG

DOCS = [
    # 0: clean — 3 sentences across 2 lines, terminal punctuation
    (0, "The first sentence is here. The second one follows!\nAnd a third, asking a question?"),
    # 1: too few sentences (2 marks)
    (1, "Only one sentence here. And a fragment without an end"),
    # 2: code — curly brace
    (2, "A doc with three. Real sentences. And code!\nfunction f() { return 1; }"),
    # 3: lorem ipsum boilerplate (case-insensitive)
    (3, "Lorem Ipsum dolor sit amet. Consectetur adipiscing elit. Sed do eiusmod."),
    # 4: javascript marker
    (4, "Please enable JavaScript to view this page. Thanks. Really."),
    # 5: line statistics — 2 of 4 lines end terminally, 2 are short (<5 words)
    (5, "This line has enough words to pass.\nshort line\nAnother full line with terminal punctuation here.\ntiny one"),
    # 6: NULL text
    (6, None),
]


@pytest.fixture(scope="module")
def c4(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in c4_filter_df(d).collect()}


def test_clean_doc_keeps(c4):
    r = c4[0]
    assert r["n_sentences"] == 3 and r["keep"]
    assert not (r["has_brace"] or r["has_lorem"] or r["has_javascript"])
    assert r["frac_terminal_lines"] == 1.0


def test_each_rule_trips_its_doc(c4):
    assert c4[1]["n_sentences"] == 1 and not c4[1]["keep"]
    assert c4[2]["has_brace"] and not c4[2]["keep"]
    assert c4[3]["has_lorem"] and not c4[3]["keep"]
    assert c4[4]["has_javascript"] and not c4[4]["keep"]


def test_line_statistics(c4):
    r = c4[5]
    assert r["n_lines"] == 4
    assert r["frac_terminal_lines"] == 0.5
    assert r["frac_short_lines"] == 0.5


def test_null_text_keep_false(c4):
    r = c4[6]
    assert not r["keep"] and r["n_lines"] is None and r["frac_short_lines"] is None


def test_c4_cross_engine_on_planted_docs(spark, c4):
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    oracle = con.execute(CATALOG["c4_quality_filter"].oracle).fetchdf()
    for _, row in oracle.iterrows():
        got = c4[row["doc_id"]]
        for col in oracle.columns:
            want, have = row[col], got[col]
            if pd.isna(want):
                assert have is None, (row["doc_id"], col, have)
            elif isinstance(want, float):
                assert have == pytest.approx(want), (row["doc_id"], col)
            else:
                assert have == want, (row["doc_id"], col, want, have)


BPE_DOCS = [
    # 'state-of-the-art!!!' = 4 letter runs + 3 '-' singles-as-one-run each
    # + one '!!!' run = state|-|of|-|the|-|art|!!! = 8; ws count = 1
    (0, "state-of-the-art!!!"),
    # contractions split as GPT-2 does: don|'t|stop = 3
    (1, "don't stop"),
    # digit runs: v2 = v|2; 3.14 = 3|.|14
    (2, "v2 costs 3.14 dollars"),
    (3, None),
    (4, ""),
]


def test_bpe_lexer_counts(spark):
    from hdfs2cass_spark.plans.c4 import _BPE_SPARK
    from pyspark.sql import functions as F

    d = spark.createDataFrame(BPE_DOCS, "doc_id long, text string")
    toks = {
        r["doc_id"]: r["t"]
        for r in d.select(
            "doc_id",
            F.expr(f"regexp_extract_all(text, '{_BPE_SPARK}', 0)").alias("t"),
        ).collect()
    }
    assert toks[0] == ["state", "-", "of", "-", "the", "-", "art", "!!!"]
    assert toks[1] == ["don", "'t", "stop"]
    assert toks[2] == ["v", "2", "costs", "3", ".", "14", "dollars"]
    assert toks[3] is None and toks[4] == []


def test_bpe_cross_engine_on_planted_docs(spark):
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(BPE_DOCS, columns=["doc_id", "text"]))
    oracle = con.execute(CATALOG["bpe_token_counts"].oracle).fetchdf()

    from hdfs2cass_spark.plans.c4 import bpe_counts_df

    d = spark.createDataFrame(BPE_DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in bpe_counts_df(d).collect()}
    for _, row in oracle.iterrows():
        g = got[row["doc_id"]]
        for col in oracle.columns:
            want, have = row[col], g[col]
            if pd.isna(want):
                assert have is None, (row["doc_id"], col, have)
            elif isinstance(want, float):
                assert have == pytest.approx(want), (row["doc_id"], col)
            else:
                assert have == want, (row["doc_id"], col, want, have)


def test_c4_and_bpe_plans_are_map_side(spark):
    """Both rows are single-scan map-side shapes whose only exchanges are
    the presentation pair (round 10, plans/present.py): ONE hash barrier
    directly under the ORDER BY's rangepartitioning, map-only below it."""
    import os

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    for name in ("c4_quality_filter", "bpe_token_counts"):
        plan = (
            CATALOG[name]
            .fn(spark, sf)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1, name
        below = plan.split("Exchange hashpartitioning", 1)[1]
        assert "Exchange" not in below, name
        assert plan.index("rangepartitioning") < plan.index(
            "Exchange hashpartitioning"
        ), name


def test_fertility_rollup_on_planted_multiscript_docs(spark, tmp_path):
    """Fertility must exceed 1.0 when the lexer fragments text beyond
    whitespace words (punctuation runs, contractions, digit/letter splits)
    — the fixture corpus is plain ASCII words (fertility exactly 1.0
    everywhere, which the oracle check covers), so the discriminating
    geometry is planted here."""
    rows = [
        (0, "plain words only here", "en"),
        (1, "don't stop, really!! cost: $4.99 (sale)", "en"),
        (2, "abc123def456", "de"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r.lang: r for r in CATALOG["token_fertility_by_lang"].fn(spark, str(tmp_path)).collect()}
    assert out["en"].n_docs == 2 and out["de"].n_docs == 1
    # doc 0: 4 ws words / 4 tokens; doc 1 fragments heavily -> en fertility > 1
    assert out["en"].fertility > 1.0
    # abc123def456 = one ws word, 4 lexer tokens (letters/digits alternate)
    assert out["de"].n_ws_tokens == 1 and out["de"].n_bpe_tokens == 4
    assert out["de"].fertility == 4.0
