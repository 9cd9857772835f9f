"""Integer PageRank (operators/graph.py): hand-computed fixed-point
values on a 3-node graph, determinism under repartitioning, and the
doc-key edge derivation. The host_rank oracle asserts the full 8-step
recursion bit-for-bit vs DuckDB's unrolled CTE chain."""

from filtlong_spark.operators import graph

SCALE = graph.PR_SCALE


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_pagerank_hand_computed_one_step(spark):
    # A->B, A->C, B->A; C is a sink (its mass evaporates — documented)
    e = _edges(spark, [("A", "B"), ("A", "C"), ("B", "A")])
    r0 = {r["host"]: r["rank"]
          for r in graph.pagerank_int(e, 0).collect()}
    assert r0 == {h: SCALE // 3 for h in "ABC"}
    r1 = {r["host"]: r["rank"]
          for r in graph.pagerank_int(e, 1).collect()}
    base = (15 * SCALE) // (100 * 3)
    ra = SCALE // 3
    assert r1["A"] == base + (85 * (ra // 1)) // 100       # from B
    assert r1["B"] == base + (85 * (ra // 2)) // 100       # from A
    assert r1["C"] == r1["B"]
    # the hub pointed at by a whole-rank edge outranks the leaves
    assert r1["A"] > r1["B"]


def test_pagerank_deterministic_across_layout(spark):
    pairs = [(f"h{i}", f"h{(i * 7 + 3) % 11}") for i in range(11)] + \
            [(f"h{i}", f"h{(i + 1) % 11}") for i in range(11)]
    a = sorted(map(tuple, graph.pagerank_int(
        _edges(spark, pairs), 6).collect()))
    b = sorted(map(tuple, graph.pagerank_int(
        _edges(spark, pairs).repartition(5), 6).collect()))
    assert a == b
    # mass sanity: total never exceeds SCALE (floor + sinks only lose)
    assert sum(r for _h, r in a) <= SCALE


def test_host_edges_deterministic_and_total(spark):
    docs = spark.createDataFrame(
        [(i, f"host{i % 4}") for i in range(40)],
        "doc_id long, source string")
    e1 = {tuple(r) for r in graph.host_edges(docs).collect()}
    e2 = {tuple(r) for r in graph.host_edges(docs.repartition(7)).collect()}
    assert e1 == e2 and len(e1) > 0
    srcs = {s for s, _d in e1}
    dsts = {d for _s, d in e1}
    assert srcs == {f"host{i}" for i in range(4)}
    assert dsts <= srcs
