"""Randomized correctness for the iterative graph operators: connected
components against a Python union-find model, and scaled-integer PageRank
against a pure-Python execution of the identical recurrence (plus mass
conservation). Seeded RNG — deterministic, no hypothesis shrinking needed
for graph shapes."""

import random
import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gravitydb_spark.graph import (
    EDGES_SCHEMA,
    PROP_REFS_SCHEMA,
    PROPERTIES_SCHEMA,
    PropertyGraph,
    VERTICES_SCHEMA,
)
from gravitydb_spark.operators.iterative import (
    connected_components,
    pagerank,
    pagerank_scaled,
)


def _raw_graph(spark, n_vertices, edge_pairs):
    """Minimal PropertyGraph: ids v00..vNN, given (src, dst) index pairs."""
    ids = [f"v{i:03d}" for i in range(n_vertices)]
    v = spark.createDataFrame([(i, "x") for i in ids], VERTICES_SCHEMA)
    e = spark.createDataFrame(
        [(f"e{k}", ids[a], ids[b], "x") for k, (a, b) in enumerate(edge_pairs)],
        EDGES_SCHEMA,
    )
    p = spark.createDataFrame([], PROPERTIES_SCHEMA)
    r = spark.createDataFrame([], PROP_REFS_SCHEMA)
    return ids, PropertyGraph(spark, v, e, p, r)


class _UnionFind:
    def __init__(self, items):
        self.parent = {x: x for x in items}

    def find(self, x):
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_connected_components_matches_union_find(spark, seed):
    rng = random.Random(seed)
    n = rng.randint(20, 60)
    m = rng.randint(0, n * 2)
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    # include self-loops and duplicates deliberately
    if n > 1:
        pairs += [(0, 0), (1, 1)] + pairs[:3]
    ids, g = _raw_graph(spark, n, pairs)

    uf = _UnionFind(ids)
    for a, b in pairs:
        uf.union(ids[a], ids[b])
    expected = {x: uf.find(x) for x in ids}

    got = {
        r["id"]: r["component"] for r in connected_components(g).collect()
    }
    assert got == expected


def _python_pagerank_scaled(ids, pairs, iters, scale=10**12, dn=85, dd=100):
    """The exact integer recurrence of pagerank_scaled, in pure Python."""
    n = len(ids)
    out_edges = {}
    for a, b in pairs:
        out_edges.setdefault(ids[a], []).append(ids[b])
    deg = {k: len(v) for k, v in out_edges.items()}
    base = (scale * (dd - dn)) // (dd * n)
    rank = {x: scale // n for x in ids}
    for _ in range(iters):
        contrib = {x: 0 for x in ids}
        for src, dsts in out_edges.items():
            c = rank[src] // deg[src]
            for d in dsts:
                contrib[d] += c
        dangling = sum(rank[x] for x in ids if x not in deg)
        dpn = dangling // n
        rank = {x: base + (dn * (contrib[x] + dpn)) // dd for x in ids}
    return rank


@pytest.mark.parametrize("seed", [3, 11])
def test_pagerank_scaled_matches_python_recurrence(spark, seed):
    rng = random.Random(seed)
    n = rng.randint(10, 40)
    m = rng.randint(n, n * 3)
    # distinct (src, dst) pairs: duplicate edges collapse in a content-
    # addressed store, and the Python model counts degree per unique edge
    pairs = list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})
    ids, g = _raw_graph(spark, n, pairs)

    expected = _python_pagerank_scaled(ids, pairs, iters=4)
    got = {r["id"]: r["rank"] for r in pagerank_scaled(g, iters=4).collect()}
    assert got == expected

    # mass conservation: loses < 1 unit per division per iteration
    total = sum(got.values())
    assert abs(total - 10**12) < 100 * n * 4

    # the float version agrees to float tolerance
    fl = {r["id"]: r["rank"] for r in pagerank(g, iters=4).collect()}
    for x in ids:
        assert abs(fl[x] - got[x] / 1e12) < 1e-6


@pytest.mark.parametrize("seed", [3, 11, 99])
def test_triangle_counts_matches_brute_force(spark, seed):
    from itertools import combinations

    from gravitydb_spark.operators.iterative import triangle_counts

    rng = random.Random(seed)
    n = rng.randint(8, 25)
    m = rng.randint(n, n * 3)
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    if n > 2:  # self-loops + duplicates + a guaranteed triangle
        pairs += [(0, 0), (0, 1), (1, 2), (2, 0)] + pairs[:2]
    ids = [f"v{i:03d}" for i in range(n)]
    adj = {(min(ids[a], ids[b]), max(ids[a], ids[b])) for a, b in pairs if a != b}

    expected = {}
    for a, b, c in combinations(sorted({x for e in adj for x in e}), 3):
        if (a, b) in adj and (b, c) in adj and (a, c) in adj:
            for x in (a, b, c):
                expected[x] = expected.get(x, 0) + 1

    edges = spark.createDataFrame(
        [(lo, hi) for lo, hi in adj], "src string, dst string"
    )
    got = {r["id"]: r["triangles"] for r in triangle_counts(edges).collect()}
    assert got == expected


def test_cc_labels_edge_list_form(spark):
    from gravitydb_spark.operators.iterative import cc_labels

    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("x", "y"), ("z", "z")],
        "src string, dst string",
    )
    got = {r["id"]: r["component"] for r in cc_labels(edges).collect()}
    # z only appears in a self-loop: still labeled (itself)
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "z"}


@pytest.mark.parametrize("seed", [5, 23])
def test_hits_scaled_matches_python_model(spark, seed):
    from gravitydb_spark.operators.iterative import hits_scaled

    rng = random.Random(seed)
    n = rng.randint(8, 20)
    m = rng.randint(n, n * 2)
    pairs = list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})
    ids, g = _raw_graph(spark, n, pairs)
    scale, iters = 10**12, 3

    # pure-Python run of the identical integer recurrence
    hub = {x: scale for x in ids}
    auth = {x: 0 for x in ids}
    for _ in range(iters):
        raw = {x: 0 for x in ids}
        for a, b in pairs:
            raw[ids[b]] += hub[ids[a]]
        s = max(sum(raw.values()), 1)
        auth = {x: raw[x] * scale // s for x in ids}
        raw = {x: 0 for x in ids}
        for a, b in pairs:
            raw[ids[a]] += auth[ids[b]]
        s = max(sum(raw.values()), 1)
        hub = {x: raw[x] * scale // s for x in ids}

    got = {r["id"]: (r["auth"], r["hub"]) for r in hits_scaled(g, iters=iters).collect()}
    assert got == {x: (auth[x], hub[x]) for x in ids}


@pytest.mark.parametrize("seed", [3, 11, 29])
def test_sssp_weighted_matches_dijkstra(spark, seed):
    """Random weighted digraphs (cycles, multi-edges, unreachable nodes):
    sssp_weighted must equal a Python Dijkstra from the same source set."""
    import heapq

    from gravitydb_spark.operators.iterative import sssp_weighted

    rng = random.Random(seed)
    n = rng.randint(10, 30)
    ids = [f"v{i:03d}" for i in range(n)]
    m = rng.randint(n, 4 * n)
    triples = [
        (ids[rng.randrange(n)], ids[rng.randrange(n)], rng.randint(0, 9))
        for _ in range(m)
    ]
    sources = sorted({ids[rng.randrange(n)] for _ in range(rng.randint(1, 3))})

    # model: Dijkstra over the same multigraph
    adj = {}
    for u, v, w in triples:
        adj.setdefault(u, []).append((v, w))
    dist = {s: 0 for s in sources}
    heap = [(0, s) for s in sources]
    heapq.heapify(heap)
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, ()):
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))

    edges = spark.createDataFrame(triples, "from_id string, to_id string, w long")
    src_df = spark.createDataFrame([(s,) for s in sources], "id string")
    got = {r["id"]: r["dist"] for r in sssp_weighted(edges, src_df).collect()}
    assert got == dist


@pytest.mark.parametrize("seed", [3, 11])
def test_kcore_onion_matches_python_peel(spark, seed):
    """Random graph vs a pure-Python synchronous peel of the identical
    rule (remove all vertices with alive-degree < k each round)."""
    from gravitydb_spark.operators.iterative import kcore_onion

    rng = random.Random(seed)
    n = rng.randint(12, 30)
    ids = [f"v{i:02d}" for i in range(n)]
    m = rng.randint(n, n * 3)
    pairs = {
        tuple(sorted((rng.randrange(n), rng.randrange(n))))
        for _ in range(m)
    }
    pairs = [(a, b) for a, b in pairs if a != b]
    k = rng.randint(2, 4)

    # python model: synchronous peel, round labels
    adj = {i: set() for i in range(n)}
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    # vertex set = edge endpoints only (matches the operator's contract)
    alive = {v for v in adj if adj[v]}
    expected, rnd = {}, 0
    while True:
        rnd += 1
        dead = {v for v in alive if len(adj[v] & alive) < k}
        if not dead:
            break
        for v in dead:
            expected[ids[v]] = rnd
        alive -= dead
    for v in alive:
        expected[ids[v]] = 0

    e = spark.createDataFrame(
        [(ids[a], ids[b]) for a, b in pairs], "a string, b string"
    )
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    got = {
        r["id"]: r["peel_round"]
        for r in kcore_onion(und, k=k, max_rounds=max(rnd, 1)).collect()
    }
    assert got == expected


@pytest.mark.parametrize("seed", [7, 19])
def test_truss_peel_matches_python_peel(spark, seed):
    """Random graph vs a pure-Python synchronous truss peel of the
    identical rule (remove all edges with alive-support < k − 2 each
    round, support = shared-neighbor count over alive edges)."""
    from gravitydb_spark.operators.iterative import truss_peel

    rng = random.Random(seed)
    n = rng.randint(8, 16)
    ids = [f"v{i:02d}" for i in range(n)]
    m = rng.randint(n, n * 3)
    pairs = sorted(
        {
            tuple(sorted((rng.randrange(n), rng.randrange(n))))
            for _ in range(m)
        }
    )
    pairs = [(a, b) for a, b in pairs if a != b]
    k = rng.choice([3, 4])

    alive = set(pairs)
    expected, rnd = {}, 0
    while True:
        rnd += 1
        sup = {
            (a, b): sum(
                1
                for w in range(n)
                if w not in (a, b)
                and tuple(sorted((a, w))) in alive
                and tuple(sorted((b, w))) in alive
            )
            for (a, b) in alive
        }
        dead = {e for e, s in sup.items() if s < k - 2}
        if not dead:
            break
        for e in dead:
            expected[(ids[e[0]], ids[e[1]])] = rnd
        alive -= dead
    for a, b in alive:
        expected[(ids[a], ids[b])] = 0

    e = spark.createDataFrame(
        [(ids[a], ids[b]) for a, b in pairs], "a string, b string"
    )
    got = {
        (r["a"], r["b"]): r["peel_round"]
        for r in truss_peel(e, k=k, max_rounds=max(rnd, 1)).collect()
    }
    assert got == expected


@pytest.mark.parametrize("seed", [5, 23])
def test_weighted_pagerank_matches_python_recurrence(spark, seed):
    """Random weighted digraph vs a pure-Python run of the identical
    scaled-integer recurrence — bit-exact, any mismatch is an
    implementation divergence, not float noise."""
    from gravitydb_spark.operators.iterative import pagerank_weighted_scaled

    rng = random.Random(seed)
    n = rng.randint(8, 20)
    ids = [f"v{i:02d}" for i in range(n)]
    m = rng.randint(n, n * 3)
    edges = {}
    for _ in range(m):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges[(a, b)] = rng.randint(1, 9)
    scale, dn, dd, iters = 10**12, 85, 100, 4

    # python model
    wsum = {}
    for (a, _b), w in edges.items():
        wsum[a] = wsum.get(a, 0) + w
    base = (scale * (dd - dn)) // (dd * n)
    rank = {i: scale // n for i in range(n)}
    for _ in range(iters):
        inflow = {i: 0 for i in range(n)}
        for (a, b), w in edges.items():
            inflow[b] += (rank[a] * w) // wsum[a]
        dangling = sum(rank[i] for i in range(n) if i not in wsum)
        dpn = dangling // n
        rank = {i: base + (dn * (inflow[i] + dpn)) // dd for i in range(n)}
    expected = {ids[i]: rank[i] for i in range(n)}

    verts = spark.createDataFrame([(x,) for x in ids], "id string")
    edf = spark.createDataFrame(
        [(ids[a], ids[b], w) for (a, b), w in edges.items()],
        "from_id string, to_id string, w long",
    )
    got = {
        r["id"]: r["rank_scaled"]
        for r in pagerank_weighted_scaled(verts, edf, iters=iters).collect()
    }
    assert got == expected


def _python_ppr_scaled(ids, pairs, seeds, iters, scale=10**12, dn=85, dd=100):
    """Pure-Python execution of ppr_scaled's integer recurrence."""
    ns = len(seeds)
    base_s = (scale * (dd - dn)) // (dd * ns)
    out_deg = {}
    for a, _ in pairs:
        out_deg[ids[a]] = out_deg.get(ids[a], 0) + 1
    flag = {x: (1 if x in seeds else 0) for x in ids}
    rank = {x: flag[x] * (scale // ns) for x in ids}
    for _ in range(iters):
        in_rank = {x: 0 for x in ids}
        for a, b in pairs:
            in_rank[ids[b]] += rank[ids[a]] // out_deg[ids[a]]
        dpn = sum(rank[x] for x in ids if x not in out_deg) // ns
        rank = {
            x: flag[x] * (base_s + (dn * dpn) // dd) + (dn * in_rank[x]) // dd
            for x in ids
        }
    return rank


@pytest.mark.parametrize("seed", [5, 23, 77])
def test_ppr_scaled_matches_python_recurrence(spark, seed):
    from gravitydb_spark.operators.iterative import ppr_scaled

    rng = random.Random(seed)
    n = rng.randint(10, 40)
    m = rng.randint(n, n * 3)
    pairs = list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})
    ids, g = _raw_graph(spark, n, pairs)
    seeds = sorted(rng.sample(ids, rng.randint(1, max(1, n // 4))))

    expected = _python_ppr_scaled(ids, pairs, set(seeds), iters=4)
    seeds_df = spark.createDataFrame([(s,) for s in seeds], "id string")
    got = {
        r["id"]: r["rank"]
        for r in ppr_scaled(
            g.vertices.select("id"), g.edges.select("src", "dst"),
            seeds_df, iters=4
        ).collect()
    }
    assert got == expected
    # seedless vertices with no in-edges hold zero rank
    dst_ids = {ids[b] for _, b in pairs}
    for x in ids:
        if x not in set(seeds) and x not in dst_ids:
            assert got[x] == 0


def test_adamic_adar_matches_brute_force(spark, sf_dir):
    """g_adamic_adar vs a pure-Python recomputation from the same
    parquet inputs: top-5-by-spend candidate edges, 1/ln(deg) scores,
    top-100 rounded ordering."""
    import math
    from collections import defaultdict

    import duckdb

    from gravitydb_spark.registry import queries

    got = [
        (r["pair_id"], r["score"], r["score_scaled"])
        for r in queries()["g_adamic_adar"](spark, sf_dir).collect()
    ]

    con = duckdb.connect()
    rows = con.sql(
        f"""
        SELECT o_custkey, l_suppkey,
               round(sum(l_extendedprice * (1 - l_discount))::DOUBLE, 2)
        FROM '{sf_dir}/orders.parquet' o
        JOIN '{sf_dir}/lineitem.parquet' l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
        """
    ).fetchall()
    by_cust = defaultdict(list)
    for c, s, spend in rows:
        by_cust[c].append((-spend, s))
    edges = defaultdict(set)  # supplier -> customers
    for c, lst in by_cust.items():
        for _, s in sorted(lst)[:5]:
            edges[s].add(c)
    scores = defaultdict(float)
    for s, custs in edges.items():
        d = len(custs)
        if d < 2:
            continue
        w = 1.0 / math.log(d)
        cl = sorted(custs)
        for i in range(len(cl)):
            for j in range(i + 1, len(cl)):
                scores[(cl[i], cl[j])] += w
    ranked = sorted(
        ((round(v, 4), c1, c2) for (c1, c2), v in scores.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:100]
    expected = [
        (f"c{c1}~c{c2}", v, round(sum(
            1.0 / math.log(len(edges[s]))
            for s in edges if c1 in edges[s] and c2 in edges[s] and len(edges[s]) >= 2
        ) * 10000))
        for v, c1, c2 in ranked
    ]
    assert got == expected
