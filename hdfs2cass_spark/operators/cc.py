"""Connected components for HIGH-DIAMETER graphs: large-star / small-star.

The default engine CC (plans/llm.py connected_components) is alternating-
min label propagation — one shuffle per round, O(diameter) rounds. That is
the right shape for the engine's own workloads (near-dup / LSH cluster
graphs have diameter 2-4), but a workload whose components are long paths
(record-linkage chains, citation trails) pays diameter rounds and
eventually trips the max_iter guard. This module is the documented flip
target (ARCHITECTURE.md "Connected components at scale"): the
large-star/small-star algorithm of Kiveris et al. 2014 ("Connected
Components in MapReduce and Beyond", SoCC), which converges in O(log d)
rounds — each round two groupBy-node shuffles over the edge list.

Semantics (identical to the default): undirected edge list in, (node,
component = min node id in its component) out, isolated self-loops
ignored, equality-tested against connected_components on random graphs,
chains, and stars (tests/test_cc_star.py).

The two operations, over a working edge set kept oriented child > parent:

  large-star: for every node u, connect every STRICTLY LARGER neighbor v
    to m = min(N(u) + {u}). Never increases the edge count; strictly
    shrinks the potential Σ depth.
  small-star: for every node u, connect every neighbor v <= u (and u
    itself) to m = min of that closed smaller-neighborhood.

Both emit (big, small) pairs only, dropping self-pairs; iteration stops
when the edge set is UNCHANGED (count + order-independent xxhash64
checksum — collision-improbable, not an exact identity; see
_checksum). At the fixpoint the edge set is a star
forest: (node, root) plus the roots themselves.

Scale shape: every round is two map-side-exploded groupBy(node)
aggregates + a distinct — all shuffles on node id, map-side combined, no
broadcast that scales with the graph, no driver state beyond two scalars
per round. Superseded per-round checkpoints are released explicitly (the
fit_bpe/connected_components discipline).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ckpt import release_checkpoint


def _star_round(e: DataFrame, small: bool) -> DataFrame:
    """One large-star (small=False) or small-star (small=True) pass over an
    oriented (u, v) edge set (both orientations are built here, so callers
    keep e deduplicated child>parent). Returns the new oriented edge set."""
    sym = e.select(F.col("u").alias("n"), F.col("v").alias("nb")).unionByName(
        e.select(F.col("v").alias("n"), F.col("u").alias("nb"))
    )
    if small:
        nbrs = sym.filter(F.col("nb") <= F.col("n"))
    else:
        nbrs = sym
    # m = min over the CLOSED neighborhood (n included; for the small pass
    # every kept nb < n, so the least() is a no-op there)
    m = nbrs.groupBy("n").agg(F.min("nb").alias("_mn")).select(
        "n", F.least(F.col("_mn"), F.col("n")).alias("m")
    )
    joined = nbrs.join(m, "n")
    if small:
        # connect every v <= u AND u itself to m
        out = joined.select(F.col("nb").alias("u"), F.col("m").alias("v")).unionByName(
            m.select(F.col("n").alias("u"), F.col("m").alias("v"))
        )
    else:
        # connect every v > u to m
        out = joined.filter(F.col("nb") > F.col("n")).select(
            F.col("nb").alias("u"), F.col("m").alias("v")
        )
    return out.filter(F.col("u") != F.col("v")).distinct()


def _checksum(e: DataFrame) -> tuple[int, int]:
    """(count, order-independent xxhash64 sum) — a collision-improbable
    fingerprint of the edge set for the convergence test, NOT an exact
    identity: two different edge sets with equal count could in principle
    collide on the hash sum (~2^-64 per comparison). Acceptable here because
    star rounds are monotone (labels only decrease), so a spurious "equal"
    would stop one round early on an already-near-converged set; exact
    comparison (exceptAll().isEmpty()) would cost an extra join per round."""
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal accumulator: summing raw int64 hashes overflows ANSI mode
        F.coalesce(
            F.sum(F.xxhash64(F.col("u"), F.col("v")).cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    round_log: list | None = None,
) -> DataFrame:
    """(node, comp) via large-star/small-star — O(log d) rounds; the
    high-diameter twin of plans/llm.py connected_components (same output
    contract, same loud non-convergence failure). ``round_log`` receives
    (round_idx, edge_count, seconds) per round when a list."""
    e = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sig = _checksum(e)
    converged = False
    for _round in range(max_iter):
        t0 = time.perf_counter()
        new_e = _star_round(_star_round(e, small=False), small=True).localCheckpoint(
            eager=True
        )
        new_sig = _checksum(new_e)
        if round_log is not None:
            round_log.append((_round, new_sig[0], time.perf_counter() - t0))
        release_checkpoint(e)
        e, sig_prev, sig = new_e, sig, new_sig
        if new_sig == sig_prev:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge within {max_iter} "
            "rounds; raise max_iter"
        )
    # fixpoint edge set is a star forest: every non-root points at its root.
    # The FINAL e/nodes checkpoints are NOT released here — the returned
    # plan references them and a truncated-lineage checkpoint cannot be
    # recomputed; their blocks die with the caller's reference (only
    # superseded per-round state is eagerly freed above).
    return nodes.join(
        e.select(F.col("u").alias("node"), F.col("v").alias("comp")), "node", "left"
    ).select("node", F.coalesce(F.col("comp"), F.col("node")).alias("comp"))
