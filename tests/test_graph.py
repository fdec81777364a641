"""Iterative graph analytics (stages/graph.py)."""

import collections

import pyarrow as pa
import ray.data as rd

from shacl_validator_ray.stages.graph import pagerank


def _reference(E, iters=5, d=0.85, redistribute=False):
    nodes = sorted({x for e in E for x in e})
    N = len(nodes)
    deg = collections.Counter(s for s, _ in E)
    r = {n: 1 / N for n in nodes}
    for _ in range(iters):
        dangling = sum(r[n] for n in nodes if n not in deg) \
            if redistribute else 0.0
        s = collections.defaultdict(float)
        for u, v in E:
            s[v] += r[u] / deg[u]
        r = {n: (1 - d) / N + d * (s.get(n, 0.0) + dangling / N)
             for n in nodes}
    return {n: round(v, 6) for n, v in r.items()}


def test_pagerank_matches_single_threaded_power_iteration():
    E = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "a")]
    ds = rd.from_arrow(pa.table({"src": [e[0] for e in E],
                                 "dst": [e[1] for e in E]}))
    got = {r["node"]: r["rank"]
           for r in pagerank(ds, iters=5).to_pandas().to_dict("records")}
    assert got == _reference(E)


def test_pagerank_dedups_edges_and_handles_sinks():
    # duplicate edges count once; b is a sink (dangling mass leaks,
    # matching the documented rule)
    E = [("a", "b"), ("a", "b"), ("a", "b")]
    ds = rd.from_arrow(pa.table({"src": [e[0] for e in E],
                                 "dst": [e[1] for e in E]}))
    got = {r["node"]: r["rank"]
           for r in pagerank(ds, iters=3).to_pandas().to_dict("records")}
    assert got == _reference([("a", "b")], iters=3)


def test_pagerank_dangling_redistribution():
    """With redistribute_dangling, sink mass teleports uniformly each
    round (matches the single-threaded reference) and ranks sum to 1;
    on a sink-free graph the option is a no-op."""
    E = [("a", "b"), ("b", "c"), ("a", "c"), ("d", "a")]  # c, and then
    # d-as-pure-source: c is the only sink
    ds = rd.from_arrow(pa.table({"src": [e[0] for e in E],
                                 "dst": [e[1] for e in E]}))
    got = {r["node"]: r["rank"]
           for r in pagerank(ds, iters=4,
                             redistribute_dangling=True).to_pandas()
           .to_dict("records")}
    assert got == _reference(E, iters=4, redistribute=True)
    assert abs(sum(got.values()) - 1.0) < 1e-4, got

    E2 = [("a", "b"), ("b", "a")]
    ds2 = rd.from_arrow(pa.table({"src": [e[0] for e in E2],
                                  "dst": [e[1] for e in E2]}))
    plain = pagerank(ds2, iters=3).to_pandas()
    redis = pagerank(ds2, iters=3, redistribute_dangling=True).to_pandas()
    assert sorted(map(tuple, plain.to_numpy())) == \
        sorted(map(tuple, redis.to_numpy()))


def test_pagerank_empty():
    ds = rd.from_arrow(pa.table({"src": pa.array([], pa.string()),
                                 "dst": pa.array([], pa.string())}))
    assert pagerank(ds).count() == 0


def test_triangle_count_matches_naive():
    """Degree-ordered distributed triangle count == brute-force
    enumeration on a random graph (dups, reversed edges, self-loops)."""
    import itertools
    import random

    from shacl_validator_ray.stages.graph import triangle_count

    rng = random.Random(11)
    nodes = [f"n{i}" for i in range(30)]
    E = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(160)]
    und = {tuple(sorted(e)) for e in E if e[0] != e[1]}
    expect = sum(1 for x, y, z in itertools.combinations(sorted(nodes), 3)
                 if (x, y) in und and (x, z) in und and (y, z) in und)

    ds = rd.from_arrow(pa.table({"src": [e[0] for e in E],
                                 "dst": [e[1] for e in E]}))
    got = triangle_count(ds, n_buckets=5).to_pandas().to_dict("records")
    assert got == [{"n_triangles": expect}], (got, expect)


def test_triangle_count_empty_and_triangle_free():
    from shacl_validator_ray.stages.graph import triangle_count

    empty = rd.from_arrow(pa.table({"src": pa.array([], pa.string()),
                                    "dst": pa.array([], pa.string())}))
    assert triangle_count(empty).to_pandas()["n_triangles"].tolist() == [0]
    star = rd.from_arrow(pa.table({"src": ["c", "c", "c"],
                                   "dst": ["a", "b", "d"]}))
    assert triangle_count(star).to_pandas()["n_triangles"].tolist() == [0]


def test_kcore_peels_cascading_chains():
    """A path a-b-c-d hanging off a triangle peels away entirely at k=2
    (each removal exposes the next — needs multiple rounds); the
    triangle survives as the 2-core with all degrees 2."""
    from shacl_validator_ray.stages.graph import kcore

    edges = [("t1", "t2"), ("t2", "t3"), ("t1", "t3"),  # triangle
             ("t3", "p1"), ("p1", "p2"), ("p2", "p3")]  # chain
    ds = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges], pa.string()),
        "dst": pa.array([b for _, b in edges], pa.string())}))
    out = kcore(ds, k=2).to_pandas().sort_values("node")
    assert out["node"].tolist() == ["t1", "t2", "t3"]
    assert out["deg"].tolist() == [2, 2, 2]

    # k=3: nothing survives
    assert kcore(ds, k=3).count() == 0


def test_label_propagation_separates_cliques():
    """Two 4-cliques joined by one bridge edge: after 3 deterministic
    LPA rounds each clique converges to its own min label."""
    from shacl_validator_ray.stages.graph import label_propagation

    def clique(prefix, n):
        names = [f"{prefix}{i}" for i in range(n)]
        return [(names[i], names[j]) for i in range(n)
                for j in range(i + 1, n)]

    edges = clique("a", 4) + clique("b", 4) + [("a0", "b0")]
    ds = rd.from_arrow(pa.table({
        "src": pa.array([x for x, _ in edges], pa.string()),
        "dst": pa.array([y for _, y in edges], pa.string())}))
    out = label_propagation(ds, rounds=3).to_pandas()
    lab = dict(zip(out["node"], out["label"]))
    assert len({lab[f"a{i}"] for i in range(1, 4)}) == 1
    assert len({lab[f"b{i}"] for i in range(1, 4)}) == 1
    assert lab["a1"] != lab["b1"]


def test_bfs_hops_min_over_paths():
    """Diamond a→b→d, a→c→d plus long tail d→e: d takes the 2-hop
    minimum; nodes unreachable from the source set never appear."""
    from shacl_validator_ray.stages.graph import bfs_hops

    edges = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e"),
             ("x", "y")]  # x→y disconnected from a
    ds = rd.from_arrow(pa.table({
        "src": pa.array([p for p, _ in edges], pa.string()),
        "dst": pa.array([q for _, q in edges], pa.string())}))
    srcs = rd.from_arrow(pa.table({"node": pa.array(["a"], pa.string())}))
    out = bfs_hops(ds, srcs, rounds=3).to_pandas()
    d = dict(zip(out["node"], out["d"]))
    assert d == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3}
