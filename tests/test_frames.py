"""DFGraph — the GraphFrames-shaped facade (graph/frames.py).

Motif semantics are pinned against hand-computed expectations on a
small directed graph, and against the membership graph the registry
queries use (where a motif must reproduce the hand-written join plan's
result)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from leader_graph_spark.graph.frames import DFGraph, MotifSyntaxError


@pytest.fixture(scope="module")
def g(spark):
    # 1→2, 2→3, 1→3, 3→4 ; vertex attrs to prove struct columns
    vertices = spark.createDataFrame(
        [(i, f"v{i}") for i in (1, 2, 3, 4)], "id long, name string"
    )
    edges = spark.createDataFrame(
        [(1, 2, "a"), (2, 3, "b"), (1, 3, "c"), (3, 4, "d")],
        "src long, dst long, relationship string",
    )
    return DFGraph(vertices, edges)


def test_find_single_edge_is_triplets(g):
    out = g.find("(a)-[e]->(b)").collect()
    assert len(out) == 4
    got = {(r.a.id, r.e.relationship, r.b.id) for r in out}
    assert got == {(1, "a", 2), (2, "b", 3), (1, "c", 3), (3, "d", 4)}
    # triplets property uses the conventional names
    t = g.triplets.collect()
    assert {(r.src.id, r.dst.id) for r in t} == {(1, 2), (2, 3), (1, 3), (3, 4)}


def test_find_two_hop_unifies_shared_vertex(g):
    out = g.find("(a)-[e1]->(b); (b)-[e2]->(c)").collect()
    got = {(r.a.id, r.b.id, r.c.id) for r in out}
    assert got == {(1, 2, 3), (2, 3, 4), (1, 3, 4)}


def test_find_closing_edge_motif(g):
    # directed triangle-ish: a→b→c plus the closing a→c
    out = g.find("(a)-[e1]->(b); (b)-[e2]->(c); (a)-[e3]->(c)").collect()
    assert {(r.a.id, r.b.id, r.c.id) for r in out} == {(1, 2, 3)}


def test_find_negated_term_is_anti_join(g):
    # two-hop pairs where the closing edge does NOT exist
    out = g.find("(a)-[e1]->(b); (b)-[e2]->(c); !(a)-[]->(c)").collect()
    assert {(r.a.id, r.c.id) for r in out} == {(2, 4), (1, 4)}


def test_find_anonymous_elements_add_no_columns(g):
    out = g.find("(a)-[]->()")
    assert out.columns == ["a"]
    assert {r.a.id for r in out.collect()} == {1, 2, 3}


def test_find_syntax_errors(g):
    for bad in ("", "(a)-[e]-(b)", "!(x)-[]->(y)"):
        with pytest.raises(MotifSyntaxError):
            g.find(bad)
    with pytest.raises(MotifSyntaxError):
        g.find("(a)-[e]->(b); (b)-[e]->(c)")  # duplicate edge name


def test_find_self_loop_terms(spark):
    """GraphFrames accepts (a)-[e]->(a): it matches self-loop edges.
    Positive form finds them; negated form excludes vertices that have
    one."""
    vertices = spark.createDataFrame(
        [(i, f"v{i}") for i in (1, 2, 3)], "id long, name string"
    )
    edges = spark.createDataFrame(
        [(1, 2, "x"), (2, 2, "loop"), (2, 3, "y")],
        "src long, dst long, relationship string",
    )
    g = DFGraph(vertices, edges)
    loops = g.find("(a)-[e]->(a)").collect()
    assert {(r.a.id, r.e.relationship) for r in loops} == {(2, "loop")}
    # a→b where b has NO self-loop
    out = g.find("(a)-[e]->(b); !(b)-[]->(b)").collect()
    assert {(r.a.id, r.b.id) for r in out} == {(2, 3)}
    # self-loop unifies with other terms through the shared name;
    # b may bind the same vertex as a (GraphFrames names are not
    # required to bind distinct vertices), so the loop edge itself
    # also matches the second term
    out2 = g.find("(a)-[l]->(a); (a)-[e]->(b)").collect()
    assert {(r.a.id, r.b.id) for r in out2} == {(2, 2), (2, 3)}


def test_degree_views(g):
    assert dict((r.id, r.outDegree) for r in g.outDegrees.collect()) == {1: 2, 2: 1, 3: 1}
    assert dict((r.id, r.inDegree) for r in g.inDegrees.collect()) == {2: 1, 3: 2, 4: 1}
    assert dict((r.id, r.degree) for r in g.degrees.collect()) == {1: 2, 2: 2, 3: 3, 4: 1}


def test_filter_vertices_induces_subgraph(g):
    sub = g.filterVertices(F.col("id") <= 3)
    assert {(r.src, r.dst) for r in sub.edges.collect()} == {(1, 2), (2, 3), (1, 3)}
    assert sub.vertices.count() == 3


def test_algorithm_delegates(g):
    cc = {r.id: r.component for r in g.connectedComponents().collect()}
    assert len(set(cc.values())) == 1  # one weak component
    pr = {r.id: r.rank for r in g.pageRank(iterations=4).collect()}
    assert pr[3] > pr[2]  # 3 has two in-edges, 2 has one
    lm = g.vertices.sparkSession.createDataFrame([(1,)], "id long")
    sp = {r.id: r.dist for r in g.shortestPaths(lm, max_hops=3).collect()}
    assert sp[1] == 0 and sp[2] == 1 and sp[3] == 1 and sp[4] == 2


def test_motif_matches_handwritten_join_on_membership_graph(spark, sf_smoke):
    """The J2-style two-hop (customer→nation→region) as a motif must
    equal the hand-written join plan over the same edges."""
    from leader_graph_spark.graph.build import build_membership_edges, build_vertices

    g2 = DFGraph(build_vertices(spark, sf_smoke), build_membership_edges(spark, sf_smoke))
    motif = g2.find("(p)-[w]->(n); (n)-[b]->(r)").where(
        (F.col("w.relationship") == "WORKS_FOR")
        & (F.col("b.relationship") == "BELONGS_TO")
    )
    got = {(r.p.id, r.n.id, r.r.id) for r in motif.collect()}

    e = build_membership_edges(spark, sf_smoke)
    works = e.where(F.col("relationship") == "WORKS_FOR")
    belongs = e.where(F.col("relationship") == "BELONGS_TO")
    want = {
        tuple(r)
        for r in works.alias("w")
        .join(belongs.alias("b"), F.col("w.dst") == F.col("b.src"))
        .select("w.src", "w.dst", "b.dst")
        .collect()
    }
    assert got == want and got


def test_aggregate_messages(g):
    """GraphFrames aggregateMessages parity: sum of neighbor ids over
    both directions equals the hand-computed undirected neighbor sums,
    and a one-direction send only reaches that side."""
    both = {
        r.id: r.agg
        for r in g.aggregateMessages(
            F.sum("msg"),
            sendToSrc=F.col("dst.id"),
            sendToDst=F.col("src.id"),
        ).collect()
    }
    # edges 1→2, 2→3, 1→3, 3→4: undirected neighbor-id sums
    assert both == {1: 5, 2: 4, 3: 7, 4: 3}
    to_dst_only = {
        r.id: r.agg
        for r in g.aggregateMessages(F.count("msg"), sendToDst=F.lit(1)).collect()
    }
    assert to_dst_only == {2: 1, 3: 2, 4: 1}  # == inDegrees
    with pytest.raises(ValueError):
        g.aggregateMessages(F.sum("msg"))


def test_bfs_shortest_paths(g):
    """GraphFrames bfs parity on the toy graph (1→2, 2→3, 1→3, 3→4):
    shortest-depth semantics, struct path columns, no-revisit pruning,
    source==target depth-0 form, and the not-found empty frame."""
    # depth 1: 1→3 direct beats 1→2→3
    p = g.bfs("id = 1", "id = 3").collect()
    assert len(p) == 1 and p[0]["from"].id == 1 and p[0].to.id == 3
    assert p[0].e0.relationship == "c"
    # depth 2: 1→3→4 (columns from, e0, v1, e1, to)
    p = g.bfs("id = 1", "id = 4").collect()
    assert len(p) == 1
    r = p[0]
    assert (r["from"].id, r.v1.id, r.to.id) == (1, 3, 4)
    assert (r.e0.relationship, r.e1.relationship) == ("c", "d")
    # source satisfies target: single from/to row at depth 0
    p = g.bfs("id = 2", "id < 3").collect()
    assert len(p) == 1 and p[0]["from"].id == 2 and p[0].to.id == 2
    # unreachable within bound: empty
    assert g.bfs("id = 4", "id = 1", maxPathLength=3).count() == 0


def test_bfs_edge_filter(g):
    """edgeFilter (GraphFrames parity): banning the direct 1→3 edge
    reroutes the search through 1→2→3."""
    p = g.bfs("id = 1", "id = 3", edgeFilter="relationship != 'c'").collect()
    assert len(p) == 1
    assert (p[0]["from"].id, p[0].v1.id, p[0].to.id) == (1, 2, 3)


def test_bfs_deep_path_bounded_plan(spark):
    """Depth-8 bfs on a 10-vertex path: correct path AND a bounded
    executed plan — the per-level localCheckpoint must truncate
    lineage, so the final plan holds the LAST level's joins only, not
    the whole depth-8 join stack (exponential replanning otherwise)."""
    n = 10
    vertices = spark.createDataFrame([(i,) for i in range(1, n + 1)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "src long, dst long"
    )
    g = DFGraph(vertices, edges)
    out = g.bfs("id = 1", "id = 9", maxPathLength=10)
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["from"].id, r.to.id) == (1, 9)
    assert [r[f"v{i}"].id for i in range(1, 8)] == [2, 3, 4, 5, 6, 7, 8]
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the checkpointed step feeds the final plan as a scan; only the
    # last level's handful of joins may appear
    n_joins = plan.count("Join")
    assert n_joins <= 6, f"plan holds {n_joins} joins — lineage not truncated"


def test_scc_facade_delegate(spark):
    """stronglyConnectedComponents on a DAG+cycle fixture: the cycle
    collapses to its min id, DAG tail vertices are singletons."""
    vertices = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 5)], "id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)], "src long, dst long"
    )
    g = DFGraph(vertices, edges)
    out = {(r.id, r.component) for r in g.stronglyConnectedComponents().collect()}
    assert out == {(1, 1), (2, 1), (3, 1), (4, 4), (5, 5)}


def test_pregel_cc_equals_connected_components(spark):
    """g.pregel min-label propagation must reproduce the oracle-proven
    connected_components labels exactly (the VERDICT r7 facade-parity
    acceptance test)."""
    from leader_graph_spark.graph.algorithms import connected_components
    from leader_graph_spark.graph.frames import Pregel

    # two components: a 5-chain and a triangle, plus an isolated vertex
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (12, 10)],
        "src long, dst long",
    )
    vertices = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .unionByName(spark.createDataFrame([(99,)], "id long"))
    )
    g = DFGraph(vertices, edges)
    got = (
        g.pregel.setMaxIter(8)
        .withVertexColumn(
            "comp",
            F.col("id"),
            F.least(F.col("comp"), F.coalesce(Pregel.msg(), F.col("comp"))),
        )
        .sendMsgToDst(Pregel.src("comp"))
        .sendMsgToSrc(Pregel.dst("comp"))
        .aggMsgs(F.min(Pregel.msg()))
        .run()
    )
    expected = {
        (r.id, r.component)
        for r in connected_components(vertices, edges).collect()
    }
    assert {(r.id, r.comp) for r in got.collect()} == expected
    assert set(got.columns) == {"id", "comp"}


def test_pregel_null_messages_dropped_and_simultaneous_update(spark):
    """Null messages must not reach the aggregate, and two vertex
    columns must update against the PRE-superstep values (one select,
    GraphFrames semantics)."""
    from leader_graph_spark.graph.frames import Pregel

    vertices = spark.createDataFrame([(1, 5), (2, 7)], "id long, x long")
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    g = DFGraph(vertices, edges)
    out = (
        g.pregel.setMaxIter(1)
        .withVertexColumn("a", F.col("x"), F.coalesce(Pregel.msg(), F.lit(-1)))
        .withVertexColumn("b", F.col("x") * 10, F.col("a") + F.col("b"))
        # send only to dst, and only when src.x > 100 → null = dropped
        .sendMsgToDst(F.when(Pregel.src("x") > 100, Pregel.src("x")))
        .aggMsgs(F.sum(Pregel.msg()))
        .run()
    )
    rows = {r.id: (r.a, r.b) for r in out.collect()}
    # no message anywhere (both null): a = -1; b uses OLD a (the init x)
    assert rows[1] == (-1, 5 + 50)
    assert rows[2] == (-1, 7 + 70)


def test_pregel_storage_bounded(spark):
    """The pregel loop must release superseded round states — 12
    supersteps may leave only the final state + edge residue."""
    from leader_graph_spark.graph.frames import Pregel

    def n_persisted():
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "src long, dst long"
    )
    vertices = edges.select(F.col("src").alias("id")).unionByName(
        edges.select(F.col("dst").alias("id"))
    ).distinct()
    g = DFGraph(vertices, edges)
    base = n_persisted()
    out = (
        g.pregel.setMaxIter(12)
        .withVertexColumn(
            "comp",
            F.col("id"),
            F.least(F.col("comp"), F.coalesce(Pregel.msg(), F.col("comp"))),
        )
        .sendMsgToDst(Pregel.src("comp"))
        .sendMsgToSrc(Pregel.dst("comp"))
        .aggMsgs(F.min(Pregel.msg()))
        .run()
    )
    out.count()
    leaked = n_persisted() - base
    assert leaked <= 3, f"pregel left {leaked} persisted states"


def test_parallel_personalized_pagerank_matches_per_seed_runs(spark):
    """parallelPersonalizedPageRank's map column must equal one
    personalized_pagerank_fixed_point run per seed, bit-for-bit."""
    from leader_graph_spark.graph.algorithms import (
        personalized_pagerank_fixed_point,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 2)], "src long, dst long"
    )
    vertices = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], "id long")
    g = DFGraph(vertices, edges)
    out = g.parallelPersonalizedPageRank(sourceIds=[1, 3], maxIter=4)
    got = {r.id: dict(r.pageranks) for r in out.collect()}
    for seed in (1, 3):
        seed_df = spark.createDataFrame([(seed,)], "id long")
        exp = {
            r.id: r.rank
            for r in personalized_pagerank_fixed_point(
                edges, seed_df, iterations=4
            ).collect()
        }
        for vid in (1, 2, 3, 4):
            assert got[vid][seed] == exp.get(vid, 0), (vid, seed)


def test_parallel_ppr_rejects_fractional_percent(spark):
    vertices = spark.createDataFrame([(1,), (2,)], "id long")
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    g = DFGraph(vertices, edges)
    with pytest.raises(ValueError, match="whole percent"):
        g.parallelPersonalizedPageRank(sourceIds=[1], resetProbability=0.157)
