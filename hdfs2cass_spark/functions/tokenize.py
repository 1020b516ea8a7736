"""THE whitespace definition — spelled out once, identically on both engines.

Java regex (Spark) defines ``\\s`` as ``[ \\t\\n\\x0B\\f\\r]`` but RE2
(DuckDB) omits ``\\x0B`` (vertical tab). Any pattern written with a bare
``\\s`` therefore TOKENIZES DIFFERENTLY across engines the moment a
document contains a vertical tab — which silently breaks every word-based
oracle row at the differential gate (caught by the round-6 ``\\x0B`` row in
tests/test_null_edges.py). Every whitespace class in the repo is built from
the constants here, using Java's set (so Spark-side behavior is unchanged
and DuckDB moves to match).

Escaping conventions — the same class needs two spellings:

- ``WS_DUCK`` / ``words_duck`` — single-backslash form, for DuckDB SQL
  string literals (no escape processing) and for patterns passed to Spark
  via ``F.lit`` (``regexp_count``/``regexp_extract_all`` column args).
- ``WS_SPARK`` / ``words_spark`` — double-backslash form, for patterns
  embedded inside Spark SQL single-quoted literals (``F.expr`` parses
  ``'\\\\t'`` down to ``\\t`` before the regex engine sees it).
"""

from __future__ import annotations

# Java's \s character set, spelled out (note \x0B — the RE2 divergence)
WS_CHARS = r" \t\n\x0B\f\r"
WS_DUCK = rf"[{WS_CHARS}]"
WS_SPARK = WS_DUCK.replace("\\", "\\\\")


def words_spark(col: str = "text") -> str:
    """Spark SQL expr: whitespace-tokenized words array over ``col``."""
    return f"split(trim({col}), '{WS_SPARK}+')"


def words_duck(col: str = "text") -> str:
    """DuckDB SQL: the identical tokenization. NB: ``trim(x, ' ')``, not
    bare ``trim(x)`` — DuckDB's default trim strips UNICODE spaces
    (U+3000, U+2003, ...) while Spark's strips only ASCII 0x20; the
    explicit character argument pins DuckDB to Spark's semantics (found by
    the tokenizer fuzz battery, tests/test_tokenize_fuzz.py)."""
    return f"str_split_regex(trim({col}, ' '), '{WS_DUCK}+')"
