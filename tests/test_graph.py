"""Link-graph operators: connected components (large-star/small-star),
PageRank power iteration, and frontier priority attachment.

Oracles are tiny pure-Python implementations (union-find, dense power
iteration) — the Spark results must match them exactly / to 1e-9.
"""

import pytest

from pyspark.sql import functions as F

from vyntr_spark.operators import graph


def _cc_oracle(edges):
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
    return {n: find(n) for n in parent}


def _pr_oracle(edges, n_iter=5, d=0.85):
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    out = {}
    for s, t in edges:
        out.setdefault(s, set()).add(t)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        dangling = sum(r for v, r in rank.items() if v not in out)
        contrib = {v: 0.0 for v in nodes}
        for s, ts in out.items():
            for t in ts:
                contrib[t] += rank[s] / len(ts)
        rank = {
            v: (1 - d) / n + d * (contrib[v] + dangling / n) for v in nodes
        }
    return rank


@pytest.fixture()
def chain_and_clique_edges():
    # chain 0-1-2-3, clique {10,11,12}, singleton pair (20,21),
    # self-loop (30,30) must be ignored, duplicate edges must collapse
    return [
        (0, 1), (1, 2), (2, 3),
        (10, 11), (11, 12), (10, 12),
        (20, 21), (21, 20),
        (30, 30),
        (0, 1),
    ]


def test_connected_components_matches_union_find(spark, chain_and_clique_edges):
    e = spark.createDataFrame(chain_and_clique_edges, ["src", "dst"])
    got = {
        r["node"]: r["component"]
        for r in graph.connected_components(e).collect()
    }
    want = _cc_oracle(chain_and_clique_edges)
    assert got == want
    # chain collapses to min id 0; clique to 10; pair to 20; 30 to itself
    assert got[3] == 0 and got[12] == 10 and got[21] == 20 and got[30] == 30


def test_connected_components_long_chain(spark):
    # a 40-node chain: diameter 40, but star-contraction must converge in
    # far fewer than max_iter rounds (this is the case that kills naive
    # min-label propagation)
    edges = [(i, i + 1) for i in range(40)]
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["component"] for r in graph.connected_components(e).collect()}
    assert got == {i: 0 for i in range(41)}


def test_neardup_components_canonical_ids(spark):
    pairs = spark.createDataFrame(
        [(5, 3), (3, 9), (100, 101)], ["id_a", "id_b"]
    )
    got = {r["doc_id"]: r["canonical_id"]
           for r in graph.neardup_components(pairs).collect()}
    assert got == {3: 3, 5: 3, 9: 3, 100: 100, 101: 100}


def test_pagerank_matches_dense_oracle(spark):
    edges = [
        (0, 1), (0, 2), (1, 2), (2, 0), (3, 2),  # 4→ nothing: 4 dangling
        (4, 0),
    ]
    # make node 5 dangling (appears only as a dst)
    edges.append((2, 5))
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in graph.pagerank(e, n_iter=5).collect()}
    want = _pr_oracle(edges, n_iter=5)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_empty_graph(spark):
    e = spark.createDataFrame([], "src long, dst long")
    assert graph.pagerank(e).count() == 0


def test_frontier_priority_broadcast_join(spark):
    frontier = spark.createDataFrame(
        [("a.com", "http://a.com/1"), ("b.com", "http://b.com/1"),
         ("c.com", "http://c.com/1")],
        ["host", "url"],
    )
    ranks = spark.createDataFrame([("a.com", 0.5), ("b.com", 0.2)],
                                  ["node", "rank"])
    out = graph.frontier_priority(frontier, ranks)
    got = {r["host"]: r["priority"] for r in out.collect()}
    assert got == {"a.com": 0.5, "b.com": 0.2, "c.com": 0.0}
    # the rank side must broadcast (host-level table << frontier)
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_anchor_text_agg_known_answer(spark):
    """Normalization, frequency + lexicographic tie-break, empty/null
    anchor handling, off-host counting — against a hand-computed set."""
    rows = [
        # t1: two 'click here' variants (normalize to same), one 'about'
        ("https://a.com/1", "https://t.com/t1", "  Click\tHERE "),
        ("https://b.com/1", "https://t.com/t1", "click here"),
        ("https://b.com/2", "https://t.com/t1", "about"),
        # t2: tie 1-1 between 'beta' and 'alpha' -> alpha wins
        ("https://a.com/3", "https://t.com/t2", "beta"),
        ("https://c.com/1", "https://t.com/t2", "alpha"),
        # t3: only empty/null anchors -> null top_anchor, cnt 0
        ("https://a.com/4", "https://t.com/t3", "   "),
        ("https://t.com/x", "https://t.com/t3", None),  # on-host link
    ]
    links = spark.createDataFrame(
        rows, "src_url string, dst_url string, anchor string")
    got = {r["dst_url"]: r.asDict()
           for r in graph.anchor_text_agg(links, approx_hosts=False)
           .collect()}
    t1 = got["https://t.com/t1"]
    assert (t1["n_links"], t1["n_src_hosts"], t1["n_offhost"]) == (3, 2, 3)
    assert (t1["top_anchor"], t1["top_anchor_cnt"]) == ("click here", 2)
    t2 = got["https://t.com/t2"]
    assert (t2["top_anchor"], t2["top_anchor_cnt"]) == ("alpha", 1)
    t3 = got["https://t.com/t3"]
    assert t3["top_anchor"] is None and t3["top_anchor_cnt"] == 0
    assert (t3["n_links"], t3["n_offhost"]) == (2, 1)  # t.com/x is on-host
    # aggregate-only plan: a hot dst must never hit a single-task window
    plan = graph.anchor_text_agg(links)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan


def _hits_oracle(edges, n_iter=5):
    e = sorted({(s, t) for s, t in edges if s != t})
    nodes = sorted({u for p in e for u in p})
    hub = {v: 1.0 / len(nodes) for v in nodes}
    auth = {v: 0.0 for v in nodes}
    for _ in range(n_iter):
        auth = {v: 0.0 for v in nodes}
        for s, t in e:
            auth[t] += hub[s]
        tot = sum(auth.values()) or 1.0
        auth = {v: a / tot for v, a in auth.items()}
        hub = {v: 0.0 for v in nodes}
        for s, t in e:
            hub[s] += auth[t]
        tot = sum(hub.values()) or 1.0
        hub = {v: h / tot for v, h in hub.items()}
    return hub, auth


def test_hits_matches_dense_oracle(spark):
    edges = [(0, 1), (0, 2), (0, 3), (4, 1), (4, 2), (5, 2),
             (1, 6), (2, 6), (3, 0), (7, 7), (0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["hub"], r["auth"])
           for r in graph.hits(df, n_iter=5).collect()}
    hub, auth = _hits_oracle(edges, n_iter=5)
    assert set(got) == set(hub)
    for v in hub:
        assert got[v][0] == pytest.approx(hub[v], abs=1e-9)
        assert got[v][1] == pytest.approx(auth[v], abs=1e-9)
    # L1-normalized on both axes
    assert sum(h for h, _ in got.values()) == pytest.approx(1.0, abs=1e-9)
    assert sum(a for _, a in got.values()) == pytest.approx(1.0, abs=1e-9)


def test_hits_empty_graph(spark):
    e = spark.createDataFrame([], "src long, dst long")
    assert graph.hits(e).count() == 0


def test_neardup_keep_full_corpus(spark):
    # docs 1..12; clusters {1,2,3} and {10,11}; 4..9,12 untouched
    docs = spark.createDataFrame([(i,) for i in range(1, 13)], ["doc_id"])
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    out = graph.neardup_keep(docs, pairs).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(out) == 12  # every doc gets a row
    assert by_id[1]["keep"] == 1 and by_id[1]["canonical_id"] == 1
    assert by_id[2]["keep"] == 0 and by_id[2]["canonical_id"] == 1
    assert by_id[3]["keep"] == 0 and by_id[3]["canonical_id"] == 1
    assert by_id[10]["keep"] == 1 and by_id[11]["keep"] == 0
    for i in (4, 5, 6, 7, 8, 9, 12):  # untouched docs keep themselves
        assert by_id[i]["keep"] == 1 and by_id[i]["canonical_id"] == i
    # exactly one keeper per canonical cluster
    assert sum(r["keep"] for r in out) == 12 - 3


def test_triangle_count_known_graph(spark):
    from vyntr_spark.operators.graph import triangle_count

    # K4 on {0,1,2,3} (4 triangles) + a pendant edge + a hub wedge with
    # no closure; edges given in mixed/duplicated/directed form to
    # exercise canonicalization
    edges = [(0, 1), (1, 0), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
             (3, 4), (5, 6), (5, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    assert triangle_count(df).collect()[0]["n_triangles"] == 4


def test_triangle_count_no_python_no_window(spark):
    from tests.test_plans import audit

    from vyntr_spark.operators.graph import triangle_count

    df = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    tri = triangle_count(df)
    plan = audit.executed_plan(tri)
    assert "Window" not in plan
    assert audit.python_eval_count(tri) == 0
    assert tri.collect()[0]["n_triangles"] == 1


def test_clustering_coefficient_known_graph(spark):
    from vyntr_spark.operators.graph import clustering_coefficient

    # K4 {0,1,2,3} + pendant 3-4: inside K4 each node has deg 3 (node 3:
    # deg 4) and touches 3 triangles; node 4 deg 1 excluded
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["deg"], r["n_triangles"], r["coeff"])
           for r in clustering_coefficient(df).collect()}
    assert got[0] == (3, 3, 1.0)
    assert got[1] == (3, 3, 1.0)
    assert got[2] == (3, 3, 1.0)
    assert got[3] == (4, 3, 0.5)   # 3 of the 6 possible pairs closed
    assert 4 not in got            # deg < 2


def test_degree_histogram_buckets(spark):
    from vyntr_spark.operators.graph import degree_histogram

    # star: center deg 5 (bucket 2: 4-7), leaves deg 1 (bucket 0)
    edges = [(0, i) for i in range(1, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["deg_bucket"]: (r["lo"], r["hi"], r["n_nodes"])
           for r in degree_histogram(df).collect()}
    assert got[0] == (1, 1, 5)
    assert got[2] == (4, 7, 1)
    assert set(got) == {0, 2}
