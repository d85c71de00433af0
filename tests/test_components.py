"""connected_components vs a literal union-find over random graphs,
plus the dedup-clustering integration shape."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from car_etl_spark.operators.components import connected_components


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min node id per component
    comp = {}
    for n in list(parent):
        root = find(n)
        comp.setdefault(root, set()).add(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _check(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.component for r in connected_components(df).collect()
    }
    assert got == _union_find(edges)


def test_components_basic_shapes(spark):
    # chain (transitive closure), triangle, isolated pair, self-loop
    _check(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (20, 20), (21, 20),
                   (30, 31), (31, 32), (32, 30)])


def test_components_random_graphs_match_union_find(spark):
    rng = random.Random(5)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(40 + trial * 30)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        _check(spark, edges)


def test_components_long_path_converges(spark):
    # worst-case chain: needs O(log n) alternating rounds
    _check(spark, [(i, i + 1) for i in range(64)])


def test_neardup_cluster_rollup(spark):
    """The dedup integration: pairs -> clusters -> one canonical doc
    per cluster + copies-to-drop count."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (9, 9)], "src long, dst long"
    )
    comp = connected_components(pairs)
    rollup = (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .withColumn("copies_to_drop", F.col("cluster_size") - 1)
        .orderBy("component")
        .collect()
    )
    # (9,9) is a self-loop: node 9 must surface as its own singleton,
    # not silently vanish from the cluster map
    assert [(r.component, r.cluster_size, r.copies_to_drop) for r in rollup] == [
        (1, 3, 2), (7, 2, 1), (9, 1, 0),
    ]
