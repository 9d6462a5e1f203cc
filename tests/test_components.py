"""Connected components vs union-find oracle on structured + random graphs."""

from __future__ import annotations

import random

from webdedup import oracle
from webdedup.config import DedupConfig
from webdedup.operators.components import connected_components

CFG = DedupConfig()


def _check(spark, edges, nodes=None):
    edf = spark.createDataFrame(edges or [(0, 0)], ["u", "v"])
    if not edges:
        edf = edf.filter("u != u")
    ids = sorted({u for e in edges for u in e} | set(nodes or []))
    ndf = spark.createDataFrame([(i,) for i in ids], ["id"]) if nodes else None
    got = {r["id"]: r["cluster_id"]
           for r in connected_components(edf, nodes=ndf, cfg=CFG).collect()}
    exp = oracle.union_find_clusters(ids, {(min(u, v), max(u, v))
                                           for u, v in edges if u != v})
    # compare as partitions with min-labels (both use component-min ids)
    assert got == {i: exp[i] for i in got}, (got, exp)
    return got


def test_two_triangles(spark):
    _check(spark, [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12)])


def test_chain(spark):
    _check(spark, [(i, i + 1) for i in range(30)])


def test_star_and_selfloops(spark):
    got = _check(spark, [(5, 1), (5, 2), (5, 3), (7, 7)], nodes=[1, 2, 3, 5, 7, 9])
    assert got[9] == 9 and got[7] == 7, "isolated nodes self-cluster"


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    nodes = list(range(200))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
    _check(spark, edges, nodes=nodes)


def test_duplicate_and_reversed_edges(spark):
    _check(spark, [(1, 2), (2, 1), (1, 2), (2, 3), (3, 2)])
