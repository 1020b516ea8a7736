"""Planted multi-paragraph docs for the Gopher paragraph rules
(plans/paragraphs.py) — non-degenerate where the fixture corpus (no
newlines) cannot be, with the oracle SQL run in DuckDB over the same docs."""

import duckdb
import pandas as pd
import pytest

from hdfs2cass_spark.plans.paragraphs import paragraph_rules_df
from hdfs2cass_spark.plans.registry import CATALOG

DOCS = [
    # 0: clean — 4 distinct paragraphs (with single newlines INSIDE one:
    # the line family would see 5 lines, this family sees 4 paragraphs)
    (0, "First paragraph here.\n\nSecond one\nwith an inner newline.\n\nThird.\n\nFourth."),
    # 1: duplicate paragraphs — 10 paragraphs, 5 distinct (frac 0.5 > 0.3)
    (1, "\n\n".join(f"repeated paragraph {i % 5}" for i in range(10))),
    # 2: duplicate CHARS only — one 300-char paragraph twice among 8 short
    #    distinct ones: dup-para frac 0.1 (passes), char frac ~0.47 (fails)
    (2, "\n\n".join(["y" * 300, "y" * 300] + [f"p{i}" for i in range(8)])),
    # 3: triple newlines make empty segments — dropped, 2 paragraphs
    (3, "alpha\n\n\n\nbeta"),
    # 4: empty text
    (4, ""),
    # 5: NULL text
    (5, None),
]


@pytest.fixture(scope="module")
def paras(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in paragraph_rules_df(d).collect()}


def test_clean_doc_passes(paras):
    r = paras[0]
    assert r["n_paragraphs"] == 4 and r["keep"]
    assert r["frac_dup_paragraphs"] == 0.0


def test_duplicate_paragraphs_fail(paras):
    r = paras[1]
    assert r["frac_dup_paragraphs"] == 0.5 and not r["pass_dup_paragraphs"]
    assert not r["keep"]


def test_duplicate_chars_fail_while_para_frac_passes(paras):
    r = paras[2]
    assert r["pass_dup_paragraphs"] and not r["pass_dup_chars"]
    assert r["frac_dup_para_chars"] > 0.4 and not r["keep"]


def test_empty_segments_dropped(paras):
    assert paras[3]["n_paragraphs"] == 2 and paras[3]["keep"]


def test_null_and_empty_keep_false(paras):
    assert not paras[4]["keep"] and paras[4]["n_paragraphs"] == 0
    assert not paras[5]["keep"] and paras[5]["n_paragraphs"] is None
    assert paras[4]["frac_dup_paragraphs"] is None


def test_cross_engine_on_planted_docs(spark, paras):
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    oracle = con.execute(CATALOG["gopher_paragraph_rules"].oracle).fetchdf()
    for _, row in oracle.iterrows():
        got = paras[row["doc_id"]]
        for col in oracle.columns:
            want, have = row[col], got[col]
            if pd.isna(want):
                assert have is None, (row["doc_id"], col, have)
            elif isinstance(want, float):
                assert have == pytest.approx(want), (row["doc_id"], col)
            else:
                assert have == want, (row["doc_id"], col, want, have)


def test_paragraph_plan_is_map_side(spark, sf_dir):
    plan = (
        CATALOG["gopher_paragraph_rules"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # round 10 (plans/present.py): the presentation orderBy now sits on a
    # hash-repartition BARRIER so the range sampler reuses shuffle files
    # instead of re-running the map-only compute. Contract: exactly ONE
    # hashpartitioning (the barrier, directly under the range sort), and
    # the compute BELOW it stays shuffle-free.
    assert plan.count("Exchange hashpartitioning") == 1
    below_barrier = plan.split("Exchange hashpartitioning", 1)[1]
    assert "Exchange" not in below_barrier  # map-only under the barrier
    assert plan.index("rangepartitioning") < plan.index("Exchange hashpartitioning")
