"""Connected-components operators: equivalence of the two formulations and
the O(log n)-round convergence bound of large-star/small-star on the
adversarial case (a long path) where min-label propagation needs
O(diameter) rounds."""

from __future__ import annotations

import math

from twitter_flink_spark.operators.graph import (
    connected_components,
    connected_components_star,
)

SF_DIR = "/root/testdata/sf0.001"


def _labels(df):
    return sorted((r["doc_id"], r["cluster_id"]) for r in df.collect())


def test_star_converges_logarithmically_on_path(spark):
    """1000-node path graph: star rounds must be O(log n), nowhere near the
    999 rounds label propagation would need, and every node must land in
    the single component labeled by the min node."""
    n = 1000
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    ).repartition(8)
    rounds: list[int] = []
    labels = _labels(
        connected_components_star(pairs, max_iter=30, rounds_out=rounds)
    )
    assert labels == [(i, 0) for i in range(n)]
    # 2·ceil(log2(n)) + slack; a diameter-bound algorithm would need ~999
    assert rounds[0] <= 2 * math.ceil(math.log2(n)) + 3


def test_star_equals_label_propagation_on_multi_component(spark):
    """Both formulations must reach the identical fixed point on a graph
    with several components of different shapes (clique, path, pair,
    isolated-by-self-pair)."""
    edges = (
        # clique on 0-3
        [(a, b) for a in range(4) for b in range(a + 1, 4)]
        # path 10-15
        + [(i, i + 1) for i in range(10, 15)]
        # pair
        + [(100, 101)]
        # star centered high (center is NOT the min)
        + [(205, v) for v in (201, 202, 203)]
    )
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    a = _labels(connected_components(pairs))
    b = _labels(connected_components_star(pairs))
    assert a == b
    assert {c for _, c in b} == {0, 10, 100, 201}


def test_pagerank_matches_reference_power_iteration(spark):
    """pagerank() must equal a plain-Python power iteration with the same
    per-node formula, init, rounding and iteration count."""
    from twitter_flink_spark.operators.graph import pagerank

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")

    # reference computation (same decimal-rounded contributions)
    from collections import defaultdict
    from decimal import Decimal

    out = defaultdict(list)
    for s, d in edges:
        out[s].append(d)
    nodes = sorted({n for e in edges for n in e})
    pr = {n: 1.0 for n in nodes}
    for _ in range(3):
        recv = defaultdict(Decimal)
        for s, ds in out.items():
            c = Decimal(str(round(pr[s] / len(ds), 8)))
            for d in ds:
                recv[d] += c
        pr = {n: (1.0 - 0.85) + 0.85 * float(recv[n]) for n in nodes}

    got = {r.node: r.pr for r in pagerank(df, iters=3).collect()}
    assert set(got) == set(nodes)
    for n in nodes:
        assert abs(got[n] - pr[n]) < 1e-12, (n, got[n], pr[n])


def test_pagerank_star_center_dominates(spark):
    """Bidirectional star: the hub must outrank every leaf, and leaves
    must tie exactly (symmetry — also a determinism check)."""
    from twitter_flink_spark.operators.graph import pagerank

    leaves = [f"l{i}" for i in range(6)]
    edges = [("hub", l) for l in leaves] + [(l, "hub") for l in leaves]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.pr for r in pagerank(df, iters=4).collect()}
    assert all(got["hub"] > got[l] for l in leaves)
    assert len({got[l] for l in leaves}) == 1


def test_triangle_counts_known_graph(spark):
    """K4 plus a pendant edge: every K4 node sits in C(3,2)=3 triangles,
    the pendant node in none; total triangles = C(4,3) = 4."""
    from twitter_flink_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
         ("c", "d"), ("d", "e")],
        "a STRING, b STRING",
    )
    rows = {r.v: (r.degree, r.n_triangles)
            for r in triangle_counts(edges).collect()}
    assert rows == {"a": (3, 3), "b": (3, 3), "c": (3, 3), "d": (4, 3)}


def test_triangle_counts_triangle_free(spark):
    from twitter_flink_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],  # 4-cycle
        "a STRING, b STRING",
    )
    assert triangle_counts(edges).count() == 0


def test_triangle_counts_exactly_once_random(spark):
    """Random G(n, p): the oriented count must equal the brute-force
    count of closed triples."""
    import itertools
    import random

    from pyspark.sql import functions as F

    from twitter_flink_spark.operators.graph import triangle_counts

    rng = random.Random(11)
    nodes = [f"n{i:02d}" for i in range(14)]
    edges = [
        (a, b) for a, b in itertools.combinations(nodes, 2)
        if rng.random() < 0.35
    ]
    eset = set(edges)
    expected = sum(
        1 for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in eset and (b, c) in eset and (a, c) in eset
    )
    df = spark.createDataFrame(edges, "a STRING, b STRING")
    total = (
        triangle_counts(df).agg(F.sum("n_triangles").alias("s")).collect()[0].s
    )
    assert total == 3 * expected


def test_k_core_peel_known_graph(spark):
    """K4 with a pendant path: the 2-core (enough rounds) is exactly the
    K4 — the path peels away over successive rounds (e peels only after
    d does)."""
    from twitter_flink_spark.operators.graph import k_core_peel

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
         ("c", "d"), ("d", "e"), ("e", "f")],
        "a STRING, b STRING",
    )
    out = {r.v: r.degree for r in k_core_peel(edges, k=2, rounds=3).collect()}
    assert out == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_k_core_peel_is_monotone(spark):
    """More rounds can only shrink the survivor set."""
    from twitter_flink_spark.operators.graph import k_core_peel

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")],
        "a STRING, b STRING",
    )
    one = {r.v for r in k_core_peel(edges, k=2, rounds=1).collect()}
    two = {r.v for r in k_core_peel(edges, k=2, rounds=2).collect()}
    assert two <= one
    assert two == {"a", "b", "c"}


def test_ledger_adaptive_cc_switches_to_star_past_threshold(spark):
    """The streaming dedup ledger's clustering must route through the
    O(log n)-round star CC once accumulated pairs pass
    LEDGER_CC_STAR_THRESHOLD (a high-dup crawl makes pairs O(docs) and
    a coalesce(1) label propagation a driver-adjacent bottleneck), stay
    on the 1-task path below it, and produce IDENTICAL labels on both
    paths."""
    from twitter_flink_spark.queries.streaming import (
        LEDGER_CC_STAR_THRESHOLD,
        _cluster_pairs_adaptive,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "doc_a long, doc_b long",
    )
    used: list[bool] = []
    small = _labels(_cluster_pairs_adaptive(pairs, 6, used_star=used))
    big = _labels(
        _cluster_pairs_adaptive(
            pairs, LEDGER_CC_STAR_THRESHOLD + 1, used_star=used
        )
    )
    assert used == [False, True]
    assert small == big == _labels(connected_components(pairs))
