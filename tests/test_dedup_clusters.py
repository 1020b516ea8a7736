"""Connected-components dedup clusters: distributed result == Python BFS."""

from collections import defaultdict

from hdfs2cass_spark.plans.llm import connected_components, dedup_near_duplicates
from hdfs2cass_spark.plans import CATALOG


def _bfs_components(pairs):
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    seen, comp = {}, {}
    for start in sorted(adj):
        if start in seen:
            continue
        stack, members = [start], []
        seen[start] = True
        while stack:
            u = stack.pop()
            members.append(u)
            for v in adj[u]:
                if v not in seen:
                    seen[v] = True
                    stack.append(v)
        keeper = min(members)
        for m in members:
            comp[m] = keeper
    return comp


def test_clusters_match_bfs(spark, sf_dir):
    pairs = [(r["doc_a"], r["doc_b"]) for r in dedup_near_duplicates(spark, sf_dir).collect()]
    got = {r["doc_id"]: r["keeper"] for r in CATALOG["dedup_clusters"].fn(spark, sf_dir).collect()}
    exp = _bfs_components(pairs)
    assert got == exp
    # every keeper is a member of its own cluster and is minimal
    for doc, keeper in got.items():
        assert keeper <= doc


def test_connected_components_chain(spark):
    # a chain 1-2-3-4 plus isolated pair 10-11: two components
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], schema="src long, dst long"
    )
    got = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
