"""Gopher LINE-level quality rules (oracle row 73).

The word-statistics family of Rae et al. 2021 lives in
plans/quality.py:gopher_quality_filter; this module adds the LINE-level rule
family of the same paper (Table A1), which round 6 documented as degenerate
on the fixture corpus (documents.parquet has no newlines — every doc is one
line):

  - fraction of lines starting with a bullet marker  <= 0.90
  - fraction of lines ending with an ellipsis        <= 0.30
  - duplicate-line fraction                          <= 0.30
  - duplicate-line CHARACTER fraction                <= 0.20

Line definition, pinned for cross-engine exactness: the non-empty segments
of split(text, chr(10)) — no trimming, no other separators. A doc with zero
non-empty lines (empty text, newline-only text, NULL text) gets NULL
metrics and keep = false via coalesce — stated policy, matching the word
family's NULL handling.

On the driver's fixture corpus every doc is a single line, so the oracle
row verifies the metric arithmetic (bullet/ellipsis prefixes DO occur at
line 1) but not multi-line behavior; the NON-degenerate exercise lives in
tests/test_lines.py (planted pathological docs per rule, one per failure
mode) and the `--line-rules` stress probe (multi-line synthetic corpus).

Scale shape: pure map-side per-row array arithmetic over one scan — no
shuffle, no UDF, embarrassingly parallel at any corpus size; the only
memory term is one doc's line array, the same bound as every other
text-family operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .registry import declare

MAX_BULLET_FRAC = 0.90
MAX_ELLIPSIS_FRAC = 0.30
MAX_DUP_LINE_FRAC = 0.30
MAX_DUP_CHAR_FRAC = 0.20

# a line "starts with a bullet" iff its first two characters are one of
# these (the two-char form keeps '-word' and '*emphasis*' out of scope);
# "ends with an ellipsis" iff it ends in '...' or the single-char ellipsis
_BULLETS = ("- ", "* ", "• ")
_BULLET_SQL = "('" + "', '".join(_BULLETS) + "')"

_LINES_SPARK = "filter(split(text, '\\n', -1), l -> length(l) > 0)"
_LINES_DUCK = "list_filter(string_split(text, chr(10)), l -> length(l) > 0)"

_IS_BULLET = f"substring(l, 1, 2) IN {_BULLET_SQL}"
_IS_ELLIPSIS = "(right(l, 3) = '...' OR right(l, 1) = '…')"


def seg_dup_duck(arr: str) -> str:
    """DuckDB fragments for segment-repetition metrics over an array column:
    distinct count, total chars, distinct chars — THE shared cross-engine-
    sensitive arithmetic of the line AND paragraph repetition rules
    (plans/paragraphs.py), generated once so the two families cannot
    drift."""
    return f"""CAST(len(list_distinct({arr})) AS INTEGER) AS _nd,
             CAST(coalesce(list_sum(list_transform({arr}, s -> length(s))), 0)
                  AS BIGINT) AS _ch,
             CAST(coalesce(list_sum(list_transform(list_distinct({arr}),
                                                   s -> length(s))), 0)
                  AS BIGINT) AS _dch"""


def seg_dup_spark(arr: str) -> list:
    """The identical three metrics as Spark columns (see seg_dup_duck)."""
    return [
        F.expr(f"size(array_distinct({arr}))").cast("int").alias("_nd"),
        F.expr(
            f"coalesce(aggregate({arr}, CAST(0 AS BIGINT),"
            " (acc, s) -> acc + length(s)), CAST(0 AS BIGINT))"
        ).alias("_ch"),
        F.expr(
            f"coalesce(aggregate(array_distinct({arr}), CAST(0 AS BIGINT),"
            " (acc, s) -> acc + length(s)), CAST(0 AS BIGINT))"
        ).alias("_dch"),
    ]


@declare(
    "gopher_line_rules",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_LINES_DUCK} AS ls FROM documents),
    m AS (
      SELECT doc_id,
             CAST(len(ls) AS INTEGER) AS n_lines,
             CAST(len(list_filter(ls, l -> {_IS_BULLET})) AS INTEGER) AS _nb,
             CAST(len(list_filter(ls, l -> {_IS_ELLIPSIS})) AS INTEGER) AS _ne,
             {seg_dup_duck("ls")}
      FROM t)
    SELECT doc_id, n_lines,
           round(CAST(_nb AS DOUBLE) / nullif(n_lines, 0), 6) AS frac_bullet,
           round(CAST(_ne AS DOUBLE) / nullif(n_lines, 0), 6) AS frac_ellipsis,
           round(1.0 - CAST(_nd AS DOUBLE) / nullif(n_lines, 0), 6)
             AS frac_dup_lines,
           round(1.0 - CAST(_dch AS DOUBLE) / nullif(_ch, 0), 6)
             AS frac_dup_chars,
           coalesce(CAST(_nb AS DOUBLE) / nullif(n_lines, 0)
                      <= {MAX_BULLET_FRAC}, FALSE) AS pass_bullet,
           coalesce(CAST(_ne AS DOUBLE) / nullif(n_lines, 0)
                      <= {MAX_ELLIPSIS_FRAC}, FALSE) AS pass_ellipsis,
           coalesce(1.0 - CAST(_nd AS DOUBLE) / nullif(n_lines, 0)
                      <= {MAX_DUP_LINE_FRAC}, FALSE) AS pass_dup_lines,
           coalesce(1.0 - CAST(_dch AS DOUBLE) / nullif(_ch, 0)
                      <= {MAX_DUP_CHAR_FRAC}, FALSE) AS pass_dup_chars,
           (coalesce(CAST(_nb AS DOUBLE) / nullif(n_lines, 0)
                       <= {MAX_BULLET_FRAC}, FALSE)
            AND coalesce(CAST(_ne AS DOUBLE) / nullif(n_lines, 0)
                           <= {MAX_ELLIPSIS_FRAC}, FALSE)
            AND coalesce(1.0 - CAST(_nd AS DOUBLE) / nullif(n_lines, 0)
                           <= {MAX_DUP_LINE_FRAC}, FALSE)
            AND coalesce(1.0 - CAST(_dch AS DOUBLE) / nullif(_ch, 0)
                           <= {MAX_DUP_CHAR_FRAC}, FALSE)) AS keep
    FROM m ORDER BY doc_id
    """,
    doc="Gopher line-level quality rules (Rae et al. 2021 Table A1): per-doc "
    "bullet-start fraction, ellipsis-end fraction, duplicate-line fraction "
    "and duplicate-line CHARACTER fraction over the non-empty "
    "split(text, chr(10)) segments, four pass flags + the conjunctive keep. "
    "Pure map-side array arithmetic over one scan (integer counts, double "
    "division of identical operands) — no shuffle at any corpus size. Docs "
    "with zero non-empty lines keep NULL metrics and keep=false.",
)
def gopher_line_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    return line_rules_df(load_table(spark, sf_dir, "documents"))


def line_rules_df(d: DataFrame) -> DataFrame:
    """Composable form over any (doc_id, text, ...) DataFrame — the query
    above binds it to the documents table; tests plant pathological
    multi-line docs through this."""
    t = d.select("doc_id", F.expr(_LINES_SPARK).alias("ls"))
    m = t.select(
        "doc_id",
        F.expr("size(ls)").cast("int").alias("n_lines"),
        F.expr(f"size(filter(ls, l -> {_IS_BULLET}))").cast("int").alias("_nb"),
        F.expr(f"size(filter(ls, l -> {_IS_ELLIPSIS}))").cast("int").alias("_ne"),
        *seg_dup_spark("ls"),
    )
    nl = F.expr("nullif(n_lines, 0)")
    ch = F.expr("nullif(_ch, CAST(0 AS BIGINT))")
    fb = F.col("_nb").cast("double") / nl
    fe = F.col("_ne").cast("double") / nl
    fdl = F.lit(1.0) - F.col("_nd").cast("double") / nl
    fdc = F.lit(1.0) - F.col("_dch").cast("double") / ch
    pb = F.coalesce(fb <= MAX_BULLET_FRAC, F.lit(False))
    pe = F.coalesce(fe <= MAX_ELLIPSIS_FRAC, F.lit(False))
    pdl = F.coalesce(fdl <= MAX_DUP_LINE_FRAC, F.lit(False))
    pdc = F.coalesce(fdc <= MAX_DUP_CHAR_FRAC, F.lit(False))
    return m.select(
        "doc_id",
        "n_lines",
        F.round(fb, 6).alias("frac_bullet"),
        F.round(fe, 6).alias("frac_ellipsis"),
        F.round(fdl, 6).alias("frac_dup_lines"),
        F.round(fdc, 6).alias("frac_dup_chars"),
        pb.alias("pass_bullet"),
        pe.alias("pass_ellipsis"),
        pdl.alias("pass_dup_lines"),
        pdc.alias("pass_dup_chars"),
        (pb & pe & pdl & pdc).alias("keep"),
        # barrier-before-orderBy: map-only child (plans/present.py)
    ).repartition("doc_id").orderBy("doc_id")
