"""PII scrubbing for training corpora: deterministic regex redaction.

A 100 TB pretraining pipeline scrubs personally-identifying strings before
anything else sees the text. This is the standard regex-category pass (URLs,
emails, IPv4s, phone-shaped digit runs) expressed as PURE column expressions —
JVM-side `regexp_replace`/`regexp_extract_all`, no Python in the hot path, so
the scrub rides whatever scan/shuffle the surrounding query already does.

Cross-engine determinism: the patterns avoid every construct where Java's
regex (Spark) and RE2 (DuckDB) diverge — no backreferences, no lookaround, no
possessive quantifiers, ASCII classes only, and no bare ``\\s`` (Java includes
``\\x0B``, RE2 does not; the URL terminator spells the class out via
tokenize.WS_CHARS) — so the DuckDB oracle applies the IDENTICAL pattern
strings with `regexp_replace(..., 'g')` and gets the identical rewrite. Categories apply IN ORDER (URL before email before IP
before phone) and each category counts its matches against the text as
already scrubbed by the previous categories: a URL containing `user@host`
is one URL, not a URL plus an email, and replaced placeholders (no digits)
can never re-match a later category.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .tokenize import WS_CHARS

# (category, pattern, placeholder) — applied strictly in this order.
# NB: no bare \s anywhere — Java and RE2 disagree on \x0B (tokenize.py);
# the URL terminator class spells Java's whitespace set explicitly.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("url", rf"https?://[^{WS_CHARS}]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
]


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append `n_urls/n_emails/n_ips/n_phones` (INT; NULL text -> NULL) and
    `scrubbed` (the redacted text) to `df`.

    One sequential chain of regexp expressions per row — Catalyst keeps the
    whole thing inside whole-stage codegen; nothing here adds a shuffle, a
    UDF, or a second scan.
    """
    cur: Column = F.col(text_col)
    out = df
    for name, pat, repl in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}s",
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0))).cast("int"),
        )
        cur = F.regexp_replace(cur, pat, repl)
    return out.withColumn("scrubbed", cur)


def scrub_cte_duck(table: str = "documents", text_col: str = "text") -> str:
    """The DuckDB twin of `scrub_pii` as a nested-subquery SQL fragment
    producing (doc_id, n_urls, n_emails, n_ips, n_phones, scrubbed).

    Identical pattern strings, identical application order; `'g'` makes
    DuckDB's regexp_replace global like Spark's.
    """
    inner = f"SELECT doc_id, {text_col} AS s0 FROM {table}"
    for i, (name, pat, repl) in enumerate(PII_PATTERNS):
        prev = f"s{i}"
        nxt = f"s{i + 1}"
        carried = ", ".join(f"n_{n}s" for n, _, _ in PII_PATTERNS[:i])
        carried = carried + ", " if carried else ""
        inner = (
            f"SELECT doc_id, {carried}"
            f"CAST(len(regexp_extract_all({prev}, '{pat}')) AS INTEGER) AS n_{name}s, "
            f"regexp_replace({prev}, '{pat}', '{repl}', 'g') AS {nxt} "
            f"FROM ({inner})"
        )
    cols = ", ".join(f"n_{n}s" for n, _, _ in PII_PATTERNS)
    return (
        f"SELECT doc_id, {cols}, s{len(PII_PATTERNS)} AS scrubbed FROM ({inner})"
    )
