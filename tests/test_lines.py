"""Non-degenerate exercise of the Gopher line-level rules (plans/lines.py).

The fixture corpus has no newlines (every doc is one line), so the oracle
row verifies arithmetic but not multi-line behavior. These tests plant one
pathological multi-line document PER RULE — each trips exactly the flags it
should — and run the SAME oracle SQL over the planted docs in DuckDB, so the
cross-engine contract is verified where it actually matters.
"""

import duckdb
import pandas as pd
import pytest

from hdfs2cass_spark.plans.lines import line_rules_df
from hdfs2cass_spark.plans.registry import CATALOG

DOCS = [
    # 0: clean — 4 distinct prose lines, everything passes
    (0, "first line of prose\nsecond line here\nthird line\nfourth line"),
    # 1: bullet wall — every line a bullet (frac_bullet = 1.0 > 0.9)
    (1, "\n".join(f"- item {i}" for i in range(10))),
    # 2: ellipsis spam — 4 of 10 lines end in '...' or the unicode ellipsis
    (2, "\n".join(
        [f"teaser {i}..." if i < 3 else f"line {i}" for i in range(9)] + ["more…"]
    )),
    # 3: duplicate lines — 10 lines, 5 distinct (frac_dup_lines = 0.5 > 0.3)
    (3, "\n".join(f"repeated line {i % 5}" for i in range(10))),
    # 4: duplicate CHARS only — one 200-char line appears twice among 8 short
    #    distinct lines: dup-line frac 0.1 (passes) but dup-char frac ~0.48
    (4, "\n".join(["x" * 200, "x" * 200] + [f"l{i}" for i in range(8)])),
    # 5: unicode bullet wall ('• ' prefix)
    (5, "\n".join(f"• point {i}" for i in range(10))),
    # 6: empty text -> zero lines -> NULL metrics, keep = false
    (6, ""),
    # 7: newline-only text -> zero non-empty lines
    (7, "\n\n\n"),
    # 8: NULL text
    (8, None),
]


@pytest.fixture(scope="module")
def rules(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in line_rules_df(d).collect()}


def test_clean_doc_passes_everything(rules):
    r = rules[0]
    assert r["n_lines"] == 4
    assert r["keep"] and r["pass_bullet"] and r["pass_ellipsis"]
    assert r["pass_dup_lines"] and r["pass_dup_chars"]
    assert r["frac_bullet"] == 0.0 and r["frac_dup_lines"] == 0.0


def test_bullet_wall_fails_only_bullet(rules):
    r = rules[1]
    assert r["frac_bullet"] == 1.0 and not r["pass_bullet"]
    assert r["pass_ellipsis"] and r["pass_dup_lines"] and r["pass_dup_chars"]
    assert not r["keep"]


def test_ellipsis_spam_fails_only_ellipsis(rules):
    r = rules[2]
    assert r["frac_ellipsis"] == 0.4 and not r["pass_ellipsis"]
    assert r["pass_bullet"] and r["pass_dup_lines"] and not r["keep"]


def test_duplicate_lines_fail(rules):
    r = rules[3]
    assert r["frac_dup_lines"] == 0.5 and not r["pass_dup_lines"]
    assert r["pass_bullet"] and r["pass_ellipsis"] and not r["keep"]


def test_duplicate_chars_fail_while_dup_lines_pass(rules):
    r = rules[4]
    assert r["pass_dup_lines"]  # only 1 of 10 lines is a repeat
    assert not r["pass_dup_chars"] and r["frac_dup_chars"] > 0.4
    assert not r["keep"]


def test_unicode_bullet_counts(rules):
    r = rules[5]
    assert r["frac_bullet"] == 1.0 and not r["pass_bullet"]


def test_zero_line_docs_keep_false_with_null_metrics(rules):
    for doc_id in (6, 7, 8):
        r = rules[doc_id]
        assert not r["keep"], doc_id
        assert r["frac_bullet"] is None and r["frac_dup_chars"] is None
    assert rules[6]["n_lines"] == 0 and rules[7]["n_lines"] == 0
    assert rules[8]["n_lines"] is None  # NULL text -> NULL split


def test_cross_engine_on_planted_multiline_docs(spark, rules):
    """The oracle SQL and the Spark plan must agree on the PLANTED docs —
    the non-degenerate multi-line cases the fixture corpus cannot cover."""
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(DOCS, columns=["doc_id", "text"])
    )
    oracle = con.execute(CATALOG["gopher_line_rules"].oracle).fetchdf()
    for _, row in oracle.iterrows():
        got = rules[row["doc_id"]]
        for col in oracle.columns:
            want = row[col]
            have = got[col]
            if pd.isna(want):
                assert have is None, (row["doc_id"], col, have)
            elif isinstance(want, float):
                assert have == pytest.approx(want), (row["doc_id"], col)
            else:
                assert have == want, (row["doc_id"], col, want, have)


def test_line_rules_plan_is_map_side(spark, sf_dir):
    """The compute is shuffle-free: the only Exchange is the output ORDER BY
    rangepartitioning — no hashpartitioning (the gopher_quality_filter
    contract, held by the whole line/document heuristic family)."""
    plan = (
        CATALOG["gopher_line_rules"]
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
