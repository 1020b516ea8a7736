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
# rows 1-50; round 8 rotated LEFT so the window covered the LAST 50 declared
# oracle rows (the ones that had never had a driver verdict); rounds 9-11
# ALTERNATED per round parity between rows 1-50 and the last 50 (which covers
# at most 100 oracle rows — the catalog hit 92 in round 11). Round 12 onward
# (r11 verdict item 1): the checked rows are walked by a ROUND-ROBIN of
# ceil(n_rest / window) contiguous windows with stride = window, wrapping at
# the end — so every oracle row gets a fresh sf0.01 driver verdict at least
# every ceil(n_rest / window) rounds for ANY catalog size, and the parity
# scheme is the k == 2 special case (offsets 0 and window instead of 0 and
# n_rest - window; both pairs cover). The round number is derived from the
# committed CORRECTNESS_r{N}.json files at the repo root (the driver writes
# one per completed round, so max(N)+1 IS the running round) — deterministic
# at import time, no mutable state. Rows outside this round's window stay
# oracle-checked at sf0.001 by tests/test_catalog_oracle.py on every pytest
# run; tests/test_entry_contract.py asserts the exact rotated order AND that
# ceil(n/window) consecutive windows jointly cover the whole catalog for any
# n (see OPERATORS.md "Driver-prefix rotation").
DRIVER_PREFIX = 50


def _repo_root():
    from pathlib import Path

    return Path(__file__).resolve().parents[2]


def current_round() -> int:
    """Running round number: 1 + the highest CORRECTNESS_r{N}.json present
    in the WORKING TREE (the driver records one per completed round).
    Deliberately filesystem-based, not git-tracked-based: the moment the
    driver writes CORRECTNESS_r{N}.json (even before committing it), round
    N is over and the next gate run belongs to round N+1, so the exposed
    ordering flips with the file's appearance. The ordering is therefore
    stable WITHIN a round as long as no new CORRECTNESS file lands mid-round
    — which only the driver writes, at round end. Falls back to 1 when none
    exist (fresh checkout before any round completes)."""
    import re

    best = 0
    for p in _repo_root().glob("CORRECTNESS_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_r0*(\d+)\.json", p.name)
        if m:
            best = max(best, int(m.group(1)))
    return best + 1


def ever_driver_checked() -> frozenset[str]:
    """Query names that appear in ANY CORRECTNESS_r{N}.json in the working
    tree (committed or not — same rationale as :func:`current_round`) —
    i.e. rows that already carry at least one hard driver verdict. Rows
    NOT in this set are promoted to the front of the exposed ordering so
    a newly appended oracle row is driver-verified in the round it ships
    (the r9 review finding: pure parity alternation made a new row wait a
    full round for its first verdict). Unreadable files are skipped —
    a corrupt record must degrade to 'treat as unchecked', never crash
    queries()."""
    import json

    names: set[str] = set()
    for p in sorted(_repo_root().glob("CORRECTNESS_r*.json")):
        try:
            names.update(json.loads(p.read_text()).keys())
        except Exception:  # noqa: BLE001 — see docstring
            continue
    return frozenset(names)


def rotation(n_rest: int, round_no: int | None = None, window: int | None = None) -> int:
    """Left-rotation of the ALREADY-CHECKED oracle ordering for this round's
    driver window. ``window`` is the checked-row budget left after
    never-checked rows took the front slots (DRIVER_PREFIX - n_never).

    Round-robin over k = ceil(n_rest / window) contiguous windows: round
    ``rnd`` starts at ``((rnd - 1) % k) * window`` and wraps at the end of
    the list, so ANY k consecutive rounds jointly cover every checked row
    (the slot index (rnd - 1) % k walks all residues mod k over any k
    consecutive rounds; windows at offsets 0, w, 2w, ... (k-1)*w cover
    [0, k*w) >= [0, n_rest)). With n_rest <= window this degenerates to a
    constant 0 (one window covers everything); with n_rest <= 2*window it
    reproduces the round-9-11 parity alternation up to the even-round
    offset (w instead of n_rest - w — both pairs cover). Asserted for
    arbitrary n in test_entry_contract.py."""
    rnd = current_round() if round_no is None else round_no
    w = DRIVER_PREFIX if window is None else window
    if n_rest <= 0 or w <= 0:
        return 0
    k = -(-n_rest // w)  # ceil(n_rest / w)
    slot = (rnd - 1) % k
    return (slot * w) % n_rest


def _ordered() -> list[DeclaredQuery]:
    """Exposed ordering: never-driver-checked oracle rows first (declaration
    order — they get their first hard verdict in the round they ship), then
    the already-checked oracle rows rotated by :func:`rotation` (round-robin
    windows so every row is re-verified at least every ceil(n/window)
    rounds), rows-only entries last (documented weaker check)."""
    qs = sorted(CATALOG.values(), key=lambda q: q.oracle is None)
    n_oracle = sum(1 for q in qs if q.oracle is not None)
    oracle, rows_only = qs[:n_oracle], qs[n_oracle:]
    checked = ever_driver_checked()
    never = [q for q in oracle if q.name not in checked]
    rest = [q for q in oracle if q.name in checked]
    w = max(0, DRIVER_PREFIX - len(never))
    r = rotation(len(rest), window=w) % len(rest) if rest else 0
    return never + rest[r:] + rest[:r] + rows_only


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.fn for q in _ordered()}


def get_oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in _ordered() if q.oracle is not None}
