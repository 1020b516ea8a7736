"""Declared-query registry.

Every operator the engine claims is registered here as a *named, testable
query*: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) the equivalent DuckDB oracle SQL. The driver hash-compares the
two at sf0.01 (BASELINE.md t2); tests/test_catalog_oracle.py does the same at
sf0.001 on every run.

Determinism rules applied throughout (so value-hashes match bit-for-bit):
  - double measures are cast to DECIMAL before SUM (exact, order-independent
    accumulation — float summation order differs between engines);
    final results cast back to DOUBLE (same bits both sides)
  - averages/ratios are computed as double divisions of identical operands
    (IEEE division is correctly rounded -> identical)
  - timestamps in outputs are emitted as DATE or epoch millis (no tz ambiguity)
  - every ORDER/limit has a unique-key tiebreak
  - every computed column is aliased identically in Spark and SQL
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class DeclaredQuery:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str


CATALOG: dict[str, DeclaredQuery] = {}


def declare(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn):
        if name in CATALOG:
            raise ValueError(f"duplicate query name {name!r}")
        CATALOG[name] = DeclaredQuery(name, fn, oracle, doc)
        return fn

    return deco


def _ordered() -> list[DeclaredQuery]:
    """Oracle-backed queries first (insertion order), rows-only entries last.

    The driver's correctness gate hash-compares a bounded prefix of
    ``queries()`` (50 entries in rounds 2-3), so every hash-comparable query
    must sit inside that prefix; rows-only entries carry a documented weaker
    check and go at the end. Stable sort preserves declaration order within
    each group.
    """
    return sorted(CATALOG.values(), key=lambda q: q.oracle is None)


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.fn for q in _ordered()}


def get_oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in _ordered() if q.oracle is not None}
