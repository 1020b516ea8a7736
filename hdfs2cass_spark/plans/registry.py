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


# The driver's correctness gate hash-compares a bounded PREFIX of queries()
# (50 entries since round 2). Rounds 2-7 therefore always checked declaration
# rows 1-50; oracle-backed rows declared after them (51+) only ever had
# builder-side + judge-rehearsal green. Round 8 rotates the oracle-backed
# ordering LEFT so the driver's 50-row window covers the LAST 50 declared
# oracle rows — i.e. every row that has never had (or has the fewest) driver
# verdicts, including anything appended this round; rows 1-(n-50) drop out of
# the window this round but carry seven consecutive driver verdicts (r1-r7)
# and stay oracle-checked at sf0.001 by tests/test_catalog_oracle.py on every
# pytest run. The rotation is a pure function of the catalog (not
# round-dependent state), so the ordering stays deterministic and
# tests/test_entry_contract.py asserts it literally (see OPERATORS.md
# "Driver-prefix rotation" for the schedule rationale).
DRIVER_PREFIX = 50


def rotation(n_oracle: int) -> int:
    return max(0, n_oracle - DRIVER_PREFIX)


def _ordered() -> list[DeclaredQuery]:
    """Oracle-backed queries first (declaration order rotated left by
    :func:`rotation`), rows-only entries last.

    Every hash-comparable query must sit inside the driver's checked prefix
    across rounds (the rotation schedules WHICH 50 this round); rows-only
    entries carry a documented weaker check and always go at the end. Stable
    sort preserves declaration order within each group before rotation.
    """
    qs = sorted(CATALOG.values(), key=lambda q: q.oracle is None)
    n_oracle = sum(1 for q in qs if q.oracle is not None)
    r = rotation(n_oracle) % n_oracle if n_oracle else 0
    return qs[r:n_oracle] + qs[:r] + qs[n_oracle:]


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.fn for q in _ordered()}


def get_oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in _ordered() if q.oracle is not None}
