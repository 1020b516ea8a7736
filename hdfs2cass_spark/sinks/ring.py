"""Ring discovery and stream planning (W3) — the loader-client logic, offline.

The reference's ``ExternalSSTableLoaderClient`` fetches ``describe_ring``
(token-range -> endpoint map, ExternalSSTableLoaderClient.java:99-117) so the
SSTable loader can stream each file slice directly to every replica that owns
it. The NETWORK half (Thrift RPC, socket streaming) is connector-delegated
and impossible in this sandbox; the PLANNING half is pure token arithmetic
and is implemented here:

  - a ring is a sorted list of (owner token, endpoint): each node owns the
    range (previous_token, token], and the range below the smallest token
    wraps around from the largest (standard Cassandra token-ring semantics,
    SimpleStrategy replica placement: the owner plus the next rf-1 DISTINCT
    endpoints clockwise);
  - :func:`replicas_for_token` resolves any token to its replica set;
  - :func:`stream_plan` takes the simulated sink's per-bucket token bounds
    (sinks/simulated.py writes token-sorted buckets) and emits, per bucket,
    the endpoints that slice must stream to — exactly what the loader
    computes before opening a socket per session

so a live deployment only swaps the transport, not the routing decisions.
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Ring:
    """Sorted ring: tokens[i] is owned by endpoints[i]."""

    tokens: list[int]
    endpoints: list[str]
    rf: int = 1

    def __post_init__(self):
        if len(self.tokens) != len(self.endpoints):
            raise ValueError("tokens and endpoints must align")
        if not self.tokens:
            raise ValueError("empty ring")
        if sorted(self.tokens) != list(self.tokens):
            raise ValueError("tokens must be sorted ascending")
        if len(set(self.tokens)) != len(self.tokens):
            raise ValueError("duplicate ring tokens")
        n_eps = len(set(self.endpoints))
        if self.rf < 1 or self.rf > n_eps:
            raise ValueError(f"rf={self.rf} with {n_eps} distinct endpoints")


def ring_from_nodes(node_tokens: dict[str, list[int]], rf: int = 1) -> Ring:
    """Build a ring from per-node token lists (vnodes supported: a node may
    hold many tokens, as ``describe_ring`` reports)."""
    pairs = sorted(
        (t, ep) for ep, toks in node_tokens.items() for t in toks
    )
    return Ring([t for t, _ in pairs], [ep for _, ep in pairs], rf)


def replicas_for_token(ring: Ring, token: int) -> list[str]:
    """SimpleStrategy placement: the owner of the range containing ``token``
    plus the next rf-1 DISTINCT endpoints clockwise. A token above the
    largest ring token wraps to the smallest (the wraparound range)."""
    i = bisect.bisect_left(ring.tokens, token)
    if i == len(ring.tokens):
        i = 0  # wraparound: (max_token, +inf) belongs to the smallest token
    reps: list[str] = []
    n = len(ring.tokens)
    j = i
    while len(reps) < ring.rf:
        ep = ring.endpoints[j % n]
        if ep not in reps:
            reps.append(ep)
        j += 1
        if j - i >= n and len(reps) < ring.rf:  # fewer distinct eps than rf
            break
    return reps


def ranges_for_span(ring: Ring, lo: int, hi: int) -> list[tuple[int, list[str]]]:
    """All (owner token, replicas) ranges a token span [lo, hi] intersects —
    the per-SSTable-slice stream sessions the loader opens."""
    if lo > hi:
        raise ValueError(f"span lo {lo} > hi {hi}")
    out: list[tuple[int, list[str]]] = []
    seen: set[int] = set()
    i = bisect.bisect_left(ring.tokens, lo)
    while True:
        idx = i if i < len(ring.tokens) else 0
        owner = ring.tokens[idx]
        if owner not in seen:
            seen.add(owner)
            out.append((owner, replicas_for_token(ring, ring.tokens[idx])))
        # the range (tokens[idx-1], tokens[idx]] ends at tokens[idx]; if the
        # span extends past it, continue to the next range
        if i < len(ring.tokens) and ring.tokens[idx] < hi:
            i += 1
        else:
            break
    return out


def stream_plan(sink_df: DataFrame, ring: Ring) -> list[dict]:
    """Per simulated-sink bucket: its token bounds and the endpoints its
    SSTable slice streams to. ``sink_df`` is the frame ``bulk_load`` routes
    (or the simulated sink read back) — needs ``bucket`` and ``token``
    columns. The per-bucket bounds are ONE tiny aggregate (two longs per
    bucket reach the driver — plan metadata, not data)."""
    bounds = (
        sink_df.groupBy("bucket")
        .agg(F.min("token").alias("lo"), F.max("token").alias("hi"))
        .orderBy("bucket")
        .collect()
    )
    plan = []
    for r in bounds:
        lo, hi = int(r["lo"]), int(r["hi"])
        eps: list[str] = []
        for _, reps in ranges_for_span(ring, lo, hi):
            for ep in reps:
                if ep not in eps:
                    eps.append(ep)
        plan.append(
            {"bucket": r["bucket"], "lo": lo, "hi": hi, "endpoints": eps}
        )
    return plan
