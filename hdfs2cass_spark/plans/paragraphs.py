"""Gopher PARAGRAPH-level repetition rules (oracle row 76) — completing the
Rae et al. 2021 Table A1 family.

With this module every Table A1 rule class is implemented: word statistics
(plans/quality.py gopher_quality_filter), top-n-gram repetition
(plans/pipeline.py top_ngram_repetition), LINE-level rules (plans/lines.py),
and now the paragraph repetition pair:

  - duplicate-paragraph fraction           <= 0.30
  - duplicate-paragraph CHARACTER fraction <= 0.20

Paragraph definition, pinned: the non-empty segments of
split(text, chr(10) || chr(10)) — a blank line separates paragraphs; single
newlines stay INSIDE a paragraph (so this is not the line family under
another name: a doc can pass the line rules and fail here, and vice versa —
the planted tests include such a doc). Same NULL/zero-paragraph policy as
the siblings: NULL metrics, keep = false.

Single-line fixture corpora make every doc one paragraph (degenerate but
hash-checked); the non-degenerate exercise lives in tests/test_paragraphs.py
(planted multi-paragraph docs, oracle SQL run in DuckDB over them — the
lines-family test pattern).

Scale: pure map-side array arithmetic over one scan, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .lines import seg_dup_duck, seg_dup_spark
from .registry import declare

MAX_DUP_PARA_FRAC = 0.30
MAX_DUP_PARA_CHAR_FRAC = 0.20

# split on the literal two-newline separator; Spark's split takes a regex —
# '\n\n' is literal enough (no metacharacters) — and DuckDB splits on the
# plain string. Both then drop empty segments — note the exact arithmetic:
# a run of 2k newlines yields k-1 empty segments (4+ newlines, i.e. two
# adjacent separators, produce the first), while an ODD stray newline stays
# attached to the next paragraph ('a\n\n\nb' -> ['a', '\nb']) and counts
# toward its character length.
_PARAS_SPARK = "filter(split(text, '\\n\\n', -1), p -> length(p) > 0)"
_PARAS_DUCK = (
    "list_filter(string_split(text, chr(10) || chr(10)), p -> length(p) > 0)"
)


@declare(
    "gopher_paragraph_rules",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_PARAS_DUCK} AS ps FROM documents),
    m AS (
      SELECT doc_id,
             CAST(len(ps) AS INTEGER) AS n_paragraphs,
             {seg_dup_duck("ps")}
      FROM t)
    SELECT doc_id, n_paragraphs,
           round(1.0 - CAST(_nd AS DOUBLE) / nullif(n_paragraphs, 0), 6)
             AS frac_dup_paragraphs,
           round(1.0 - CAST(_dch AS DOUBLE) / nullif(_ch, 0), 6)
             AS frac_dup_para_chars,
           coalesce(1.0 - CAST(_nd AS DOUBLE) / nullif(n_paragraphs, 0)
                      <= {MAX_DUP_PARA_FRAC}, FALSE) AS pass_dup_paragraphs,
           coalesce(1.0 - CAST(_dch AS DOUBLE) / nullif(_ch, 0)
                      <= {MAX_DUP_PARA_CHAR_FRAC}, FALSE) AS pass_dup_chars,
           (coalesce(1.0 - CAST(_nd AS DOUBLE) / nullif(n_paragraphs, 0)
                       <= {MAX_DUP_PARA_FRAC}, FALSE)
            AND coalesce(1.0 - CAST(_dch AS DOUBLE) / nullif(_ch, 0)
                           <= {MAX_DUP_PARA_CHAR_FRAC}, FALSE)) AS keep
    FROM m ORDER BY doc_id
    """,
    doc="Gopher paragraph repetition rules (Rae et al. 2021 Table A1 — the "
    "family's last class): duplicate-paragraph fraction and duplicate-"
    "paragraph CHARACTER fraction over the non-empty split(text, "
    "chr(10)||chr(10)) segments, two pass flags + conjunctive keep. "
    "Paragraphs are blank-line separated (single newlines stay inside a "
    "paragraph — distinct from the line family). Pure map-side arithmetic, "
    "one scan, no shuffle; NULL/zero-paragraph docs keep NULL metrics and "
    "keep = false.",
)
def gopher_paragraph_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    return paragraph_rules_df(load_table(spark, sf_dir, "documents"))


def paragraph_rules_df(d: DataFrame) -> DataFrame:
    t = d.select("doc_id", F.expr(_PARAS_SPARK).alias("ps"))
    # the SHARED segment-repetition metrics (plans/lines.py seg_dup_*):
    # one definition serves the line and paragraph families
    m = t.select(
        "doc_id",
        F.expr("size(ps)").cast("int").alias("n_paragraphs"),
        *seg_dup_spark("ps"),
    )
    np_ = F.expr("nullif(n_paragraphs, 0)")
    ch = F.expr("nullif(_ch, CAST(0 AS BIGINT))")
    fdp = F.lit(1.0) - F.col("_nd").cast("double") / np_
    fdc = F.lit(1.0) - F.col("_dch").cast("double") / ch
    pdp = F.coalesce(fdp <= MAX_DUP_PARA_FRAC, F.lit(False))
    pdc = F.coalesce(fdc <= MAX_DUP_PARA_CHAR_FRAC, F.lit(False))
    return m.select(
        "doc_id",
        "n_paragraphs",
        F.round(fdp, 6).alias("frac_dup_paragraphs"),
        F.round(fdc, 6).alias("frac_dup_para_chars"),
        pdp.alias("pass_dup_paragraphs"),
        pdc.alias("pass_dup_chars"),
        (pdp & pdc).alias("keep"),
        # barrier-before-orderBy: map-only child (plans/present.py)
    ).repartition("doc_id").orderBy("doc_id")
