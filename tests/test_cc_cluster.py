"""Connected-components fuzzy-dedup clustering (stages/cc_cluster.py):
hash-min label propagation vs a plain union-find oracle, plus the full
LSH->edges->cluster->keep pipeline."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from great_expectations_ray.stages.cc_cluster import (
    cluster_near_duplicates,
    connected_components,
    minhash_bucket_edges,
)


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in nodes}


def test_connected_components_chain_multiround(ray_session):
    # a 6-node chain forces multiple propagation rounds; 10-11 is separate.
    # both the driver union-find fast path (default) and the distributed
    # propagation path (max_driver_edges=0) must emit identical labels.
    edges = rd.from_arrow(pa.table({
        "src": [1, 2, 3, 4, 5, 10],
        "dst": [2, 3, 4, 5, 6, 11],
    })).repartition(3)
    expected = {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 10: 10, 11: 10}
    for cap in (1_000_000, 0):
        out = {r["node"]: r["component"]
               for r in connected_components(
                   edges, max_driver_edges=cap).take_all()}
        assert out == expected, f"max_driver_edges={cap}"


def test_connected_components_string_ids(ray_session):
    edges = rd.from_arrow(pa.table({
        "src": ["b", "c", "x"], "dst": ["a", "b", "y"],
    }))
    expected = {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
    for cap in (1_000_000, 0):
        out = {r["node"]: r["component"]
               for r in connected_components(
                   edges, max_driver_edges=cap).take_all()}
        assert out == expected, f"max_driver_edges={cap}"


def test_connected_components_matches_union_find_random(ray_session):
    rng = np.random.default_rng(11)
    n = 300
    src = rng.integers(0, n, size=400)
    dst = rng.integers(0, n, size=400)
    edges = [(int(a), int(b)) for a, b in zip(src, dst) if a != b]
    nodes = sorted({x for e in edges for x in e})
    expected = _union_find(edges, nodes)
    ds = rd.from_arrow(pa.table({
        "src": [e[0] for e in edges], "dst": [e[1] for e in edges],
    })).repartition(5)
    for cap in (1_000_000, 0):
        out = {r["node"]: r["component"]
               for r in connected_components(
                   ds, max_driver_edges=cap).take_all()}
        assert out == expected, f"max_driver_edges={cap}"


def test_cluster_near_duplicates_end_to_end(ray_session):
    # exact duplicate groups + a unique doc; keep = exactly one per cluster
    docs = pa.table({
        "doc_id": [1, 2, 3, 4, 5],
        "content": [
            "the quick brown fox jumps over the lazy dog " * 8,
            "the quick brown fox jumps over the lazy dog " * 8,   # dup of 1
            "a completely different corpus about ray datasets " * 8,
            "a completely different corpus about ray datasets " * 8,  # dup of 3
            "nothing like the others at all in any way whatsoever " * 8,
        ],
    })
    ds = rd.from_arrow(docs).repartition(3)
    out = {r["doc_id"]: (r["cluster"], r["keep"])
           for r in cluster_near_duplicates(
               ds, id_col="doc_id", num_perm=32, bands=8).take_all()}
    assert len(out) == 5
    assert out[1] == (1, True) and out[2] == (1, False)
    assert out[3] == (3, True) and out[4] == (3, False)
    assert out[5] == (5, True)  # isolated doc is its own cluster


def test_cluster_matches_union_find_on_emitted_edges(ray_session):
    # differential: whatever edges LSH emits, the clustering must be their
    # exact transitive closure
    rng = np.random.default_rng(5)
    base = ["alpha beta gamma delta epsilon zeta", "one two three four five six",
            "red green blue yellow purple orange"]
    texts, ids = [], []
    for i in range(60):
        t = base[i % 3]
        if i % 5 == 0:  # light mutation keeps some near-dup variety
            t = t + f" tail{i % 7}"
        texts.append(t)
        ids.append(i)
    ds = rd.from_arrow(pa.table({"doc_id": ids, "content": texts})).repartition(4)
    kwargs = dict(id_col="doc_id", num_perm=32, bands=8, shingle_k=5)
    edge_rows = minhash_bucket_edges(ds, **kwargs).take_all()
    edges = [(r["src"], r["dst"]) for r in edge_rows]
    expected = _union_find(edges, set(ids))
    # broadcast fast path (default cap) and distributed join path must agree
    for cap in (1_000_000, 0):
        out = {r["doc_id"]: r["cluster"]
               for r in cluster_near_duplicates(
                   ds, max_driver_edges=cap, **kwargs).take_all()}
        assert out == expected, f"max_driver_edges={cap}"
    # keep-one invariant
    keeps = [r for r in cluster_near_duplicates(ds, **kwargs).take_all() if r["keep"]]
    assert len(keeps) == len(set(expected.values()))


def test_keep_best_in_cluster(ray_session):
    """Best-of-cluster retention: keep the highest-score member per cluster
    (ties -> min id); isolated docs keep themselves; docs missing from the
    score table lose to any scored clustermate."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from great_expectations_ray.stages.cc_cluster import keep_best_in_cluster

    clustered = rd.from_arrow(pa.table({
        # clusters: {0,1,2} (min-id 0), {5,6} (min-id 5), {9} isolated
        "doc_id": [0, 1, 2, 5, 6, 9],
        "cluster": [0, 0, 0, 5, 5, 9],
    })).repartition(3)
    scores = rd.from_arrow(pa.table({
        "doc_id": [0, 1, 2, 5, 9],     # 6 has NO score -> ranks last
        "score": [10, 99, 99, 1, 7],   # tie 1 vs 2 -> min id (1) wins
    })).repartition(2)

    out = keep_best_in_cluster(
        clustered, scores, id_col="doc_id", score_col="score"
    ).take_all()
    kept = sorted(r["doc_id"] for r in out if r["keep"])
    assert kept == [1, 5, 9]
    assert len(out) == 6
    # dtypes restored after the join's null padding
    assert all(isinstance(r["doc_id"], int) for r in out)
