"""Fuzz differential for the round-7 text-rule family (lines, paragraphs,
C4, BPE counts): a deterministic battery of nasty multi-line documents —
control chars, the Java-vs-RE2 \\x0B divergence, unicode spaces/bullets/
ellipses, CJK, emoji, newline runs, braces — run through BOTH engines via
each row's REGISTERED oracle SQL, asserting every output column agrees.

The \\x0B lesson generalized: the line/paragraph/sentence/lexer definitions
are all regex- and character-class-driven, so class-membership divergence
is exactly the bug class a fixture cannot catch until the right character
lands in a fixture. 250 random docs + targeted shapes catch it now."""

from __future__ import annotations

import math
import random

import duckdb
import pandas as pd
import pytest

from hdfs2cass_spark.plans.registry import CATALOG

_ALPHABET = (
    list("abcXYZ019_.,!?/{}")
    + [" ", "\t", "\n", "\x0b", "\f", "\r", "\n\n"]
    + ["- ", "* ", "• ", "...", "…", ". "]
    + [" ", " ", "　"]  # unicode spaces
    + ["é", "中", "́", "\U0001f600"]
    + ["javascript", "lorem ipsum", "don't"]
)


def _battery() -> list[str | None]:
    rnd = random.Random(20260815)
    out: list[str | None] = []
    for _ in range(250):
        length = rnd.randrange(0, 30)
        out.append("".join(rnd.choice(_ALPHABET) for _ in range(length)))
    out += [
        None, "", "\n", "\n\n\n", "- \n- \n- ", "...…...",
        "a\x0bb\nc", "•\n• \n•x", "{\n}", "one. two? three!",
        "line one\n\nline one\n\nline two", "\x0b\n\x0b\n\x0b",
    ]
    return out


_QUERIES = [
    "gopher_line_rules",
    "gopher_paragraph_rules",
    "c4_quality_filter",
    "bpe_token_counts",
]

_DF_FNS = {}


def _spark_frames(spark, docs):
    from hdfs2cass_spark.plans.c4 import bpe_counts_df, c4_filter_df
    from hdfs2cass_spark.plans.lines import line_rules_df
    from hdfs2cass_spark.plans.paragraphs import paragraph_rules_df

    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    return {
        "gopher_line_rules": line_rules_df(d),
        "gopher_paragraph_rules": paragraph_rules_df(d),
        "c4_quality_filter": c4_filter_df(d),
        "bpe_token_counts": bpe_counts_df(d),
    }


@pytest.mark.parametrize("name", _QUERIES)
def test_text_rules_agree_on_fuzz_battery(spark, name):
    docs = _battery()
    got = {r["doc_id"]: r.asDict() for r in _spark_frames(spark, docs)[name].collect()}
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(docs)), "text": docs}),
    )
    oracle = con.execute(CATALOG[name].oracle).fetchdf()
    assert len(oracle) == len(docs)
    mismatches = []
    for _, row in oracle.iterrows():
        g = got[row["doc_id"]]
        for col in oracle.columns:
            w, h = row[col], g[col]
            if (w is None or (isinstance(w, float) and math.isnan(w))) != (h is None):
                mismatches.append((row["doc_id"], col, w, h))
            elif h is None:
                continue
            elif isinstance(w, float):
                if h != pytest.approx(w):
                    mismatches.append((row["doc_id"], col, w, h))
            elif h != w:
                mismatches.append((row["doc_id"], col, w, h))
    assert not mismatches, (
        f"{len(mismatches)} divergent cells; first: {mismatches[0]!r} "
        f"doc={docs[mismatches[0][0]]!r}"
    )
