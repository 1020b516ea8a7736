"""Property-based tests for the corpus-quality specs (hypothesis + DuckDB).

The catalog differential proves Spark == oracle; these properties prove the
ORACLE means what the operator claims, against a third, independent
pure-Python reference — on hypothesis-generated corpora, not fixtures. They
run on DuckDB only (no Spark session), so hundreds of examples stay cheap.

Tokenization scope: generated texts have no leading/trailing whitespace, so
the Java-split trailing-empty corner is out of scope here — that corner is
pinned cross-engine by tests/test_null_edges.py.
"""

from __future__ import annotations

import re

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hdfs2cass_spark.plans import CATALOG

_STOP = {"the", "a", "and", "of", "to"}

_word = st.one_of(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=12),
    st.sampled_from(sorted(_STOP)),
    st.sampled_from(["123", "9", "supercalifragilisticexp"]),
)
_sep = st.sampled_from([" ", "  ", "\t", " \t "])


@st.composite
def _doc_text(draw):
    words = draw(st.lists(_word, min_size=1, max_size=80))
    seps = [draw(_sep) for _ in range(len(words) - 1)]
    return "".join(
        w + (seps[i] if i < len(seps) else "") for i, w in enumerate(words)
    )


def _py_words(text: str) -> list[str]:
    return re.split(r"[ \t\n\x0b\f\r]+", text.strip(" "))


def _run_on_docs(name: str, rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars INTEGER)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?, ?, ?)", rows)
    rel = con.sql(CATALOG[name].oracle)
    cols = rel.columns
    out = [dict(zip(cols, r)) for r in rel.fetchall()]
    con.close()
    return out


@settings(max_examples=60, deadline=None)
@given(st.lists(_doc_text(), min_size=1, max_size=12))
def test_gopher_oracle_matches_python_reference(texts):
    rows = [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)]
    got = {r["doc_id"]: r for r in _run_on_docs("gopher_quality_filter", rows)}
    assert set(got) == set(range(len(texts)))
    for i, t in enumerate(texts):
        ws = _py_words(t)
        n = len(ws)
        mwl = sum(len(w) for w in ws) / n
        alpha = sum(1 for w in ws if re.search("[a-zA-Z]", w)) / n
        stops = sum(1 for w in ws if w in _STOP)
        r = got[i]
        assert r["n_words"] == n
        assert r["mean_word_len"] == pytest.approx(mwl, abs=1e-6)
        assert r["frac_alpha_words"] == pytest.approx(alpha, abs=1e-6)
        assert r["n_stop_words"] == stops
        assert r["pass_n_words"] == (50 <= n <= 100_000)
        assert r["pass_word_len"] == (3.0 <= mwl <= 10.0)
        assert r["pass_alpha"] == (alpha >= 0.8)
        assert r["pass_stop"] == (stops >= 2)
        assert r["keep"] == (
            r["pass_n_words"] and r["pass_word_len"] and r["pass_alpha"] and r["pass_stop"]
        )


@settings(max_examples=40, deadline=None)
@given(st.lists(_doc_text(), min_size=1, max_size=15))
def test_token_budget_oracle_is_greedy_prefix(texts):
    """Whatever the oracle scores each doc, its SELECTION must be the greedy
    quality-descending prefix that fills the budget — checked by re-deriving
    the selection in Python from the oracle's own (quality, n_tokens)."""
    from hdfs2cass_spark.plans.quality import TOKEN_BUDGET

    rows = [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)]
    selected = _run_on_docs("select_token_budget", rows)
    # side query: every doc's oracle-reported score and token count
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars INTEGER)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?, ?, ?)", rows)
    scored = con.sql(
        r"""
        WITH t AS (SELECT doc_id, str_split_regex(trim(text), '\s+') AS ws
                   FROM documents WHERE text IS NOT NULL)
        SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
               round(0.6 * (CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws))
                     + 0.4 * (1.0 - CAST(len(list_filter(ws,
                         w -> w IN ('the', 'a', 'and', 'of', 'to'))) AS DOUBLE)
                       / len(ws)), 6) AS quality
        FROM t WHERE len(ws) >= 1
        """
    ).fetchall()
    con.close()
    order = sorted(scored, key=lambda r: (-r[2], r[0]))
    want, used = [], 0
    for doc_id, n_tokens, quality in order:
        if used < TOKEN_BUDGET:
            want.append((doc_id, quality, n_tokens, used))
        used += n_tokens
    got = sorted((r["doc_id"], r["quality"], r["n_tokens"], r["budget_used_before"]) for r in selected)
    assert got == sorted(want)
