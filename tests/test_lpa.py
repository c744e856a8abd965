"""Fixed-round LPA semantics: two-clique splitting, min-label tie
order, bipartite round-parity oscillation, and a python model replay."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F  # noqa: F401

from leader_graph_spark.graph.algorithms import label_propagation_fixed, symmetrize


def _model(edges: list[tuple[str, str]], rounds: int) -> dict[str, str]:
    sym = set()
    for s, d in edges:
        sym.add((s, d))
        sym.add((d, s))
    nbrs: dict[str, list[str]] = {}
    for s, d in sym:
        nbrs.setdefault(d, []).append(s)
        nbrs.setdefault(s, [])
    labels = {v: v for v in nbrs}
    for _ in range(rounds):
        new = {}
        for v in nbrs:
            if not nbrs[v]:
                new[v] = labels[v]
                continue
            counts = Counter(labels[u] for u in nbrs[v])
            best = max(counts.values())
            new[v] = min(l for l, c in counts.items() if c == best)
        labels = new
    return labels


def _run(spark, edges, rounds):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r.id: r.community
        for r in label_propagation_fixed(df, rounds=rounds).collect()
    }


def test_two_cliques_with_bridge_split(spark):
    # two triangles joined by one bridge edge: LPA must keep them as
    # two communities (CC would merge them into one).
    edges = [
        ("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
        ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
        ("a3", "b1"),
    ]
    got = _run(spark, edges, rounds=4)
    assert got == _model(edges, 4)
    # the a-clique's labels never leave the a-side (the bridge can pull
    # a-labels INTO b, not the reverse, under min tie-breaking).
    assert {got["a1"], got["a2"], got["a3"]} <= {"a1", "a2", "a3"}
    assert len(set(got.values())) >= 2  # still more than one community


def test_min_label_tie_break(spark):
    # v's neighbors carry labels {x, z} with equal count → min wins.
    edges = [("v", "x"), ("v", "z")]
    got = _run(spark, edges, rounds=1)
    assert got["v"] == "x"
    assert got == _model(edges, 1)


def test_bipartite_round_parity(spark):
    # star hub + leaves: labels oscillate — leaves take the hub's label
    # on odd rounds, the hub's old label flows back on even rounds.
    edges = [("hub", "l1"), ("hub", "l2"), ("hub", "l3")]
    r1 = _run(spark, edges, 1)
    r2 = _run(spark, edges, 2)
    assert r1 == _model(edges, 1)
    assert r2 == _model(edges, 2)
    assert r1["l1"] == "hub" and r2["l1"] == "l1"  # leaf: hub's label, then l1 flows back
    assert r1["hub"] == "l1" and r2["hub"] == "hub"  # hub: min leaf, then its own returns


def test_matches_model_on_random_graph(spark):
    import random

    rng = random.Random(5)
    nodes = [f"n{i:02d}" for i in range(24)]
    edges = list({(a, b) for a, b in (
        tuple(sorted(rng.sample(nodes, 2))) for _ in range(60)
    )})
    for rounds in (1, 3):
        assert _run(spark, edges, rounds) == _model(edges, rounds)
