"""Similarity search over embedding columns.

- ``brute_force_topk``: exact cosine top-k.  The query matrix is broadcast
  once (``ray.put``); every batch computes a vectorized matmul and emits only
  its LOCAL top-k rows, so the driver merge handles #blocks × k rows — never
  the full corpus.
- ``lsh_bucket_topk``: the scale path — random-hyperplane LSH buckets
  (seeded, deterministic); candidates are searched only within the query's
  bucket(s).  Recall/cost trade-off documented; exact variant remains the
  correctness baseline.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa


def _emb_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """(n, d) float64 matrix from an embedding column — plain ``list<float>``
    (``flatten()`` honors list offsets, unlike ``.values`` on a sliced
    array) or Ray's tensor-extension layout (pandas-hop inputs)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float64)
    if hasattr(col, "flatten") and hasattr(col, "offsets"):
        values = np.asarray(col.flatten(), dtype=np.float64)
        return values.reshape(n, -1)
    vals = col.to_numpy(zero_copy_only=False)
    if getattr(vals, "dtype", None) == object:  # variable-shaped tensor rows
        return np.stack([np.asarray(v, dtype=np.float64).ravel()
                         for v in vals])
    return np.asarray(vals, dtype=np.float64).reshape(n, -1)


def brute_force_topk(
    ds,
    query: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """Exact cosine top-k: returns [(id, cosine)] sorted by (-cos, id)."""
    import ray

    q = np.asarray(query, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    q_ref = ray.put(qn)

    def local_topk(tbl: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        M = _emb_matrix(tbl.column(emb_col))
        if M.shape[0] == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        norms = np.linalg.norm(M, axis=1)
        sims = (M @ qv) / np.maximum(norms, 1e-30)
        ids = np.asarray(tbl.column(id_col), dtype=np.int64)
        take = min(k, len(sims))
        part = np.argpartition(-sims, take - 1)[:take]
        return pa.table({id_col: pa.array(ids[part]), "cosine": pa.array(sims[part])})

    rows = ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True).take_all()
    best = heapq.nsmallest(k, rows, key=lambda r: (-r["cosine"], r[id_col]))
    return [(int(r[id_col]), float(r["cosine"])) for r in best]


def lsh_bucket_assignments(M: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Bucket id per row: sign pattern over ``planes`` hyperplanes."""
    bits = (M @ planes.T) > 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return bits.astype(np.int64) @ weights


def lsh_topk(
    ds,
    query: np.ndarray,
    k: int = 10,
    *,
    n_planes: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """Approximate top-k: only rows in the query's LSH bucket are scored.
    At corpus scale, bucket assignment becomes a stored partition column and
    the read prunes to one bucket directory."""
    import ray

    q = np.asarray(query, dtype=np.float64)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, q.shape[0]))
    q_bucket = int(lsh_bucket_assignments(q[None, :], planes)[0])
    qn = q / np.linalg.norm(q)
    ref = ray.put((qn, planes, q_bucket))

    def local(tbl: pa.Table) -> pa.Table:
        qv, pl, qb = ray.get(ref)
        M = _emb_matrix(tbl.column(emb_col))
        if M.shape[0] == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        buckets = lsh_bucket_assignments(M, pl)
        mask = buckets == qb
        M = M[mask]
        ids = np.asarray(tbl.column(id_col), dtype=np.int64)[mask]
        if M.shape[0] == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        sims = (M @ qv) / np.maximum(np.linalg.norm(M, axis=1), 1e-30)
        take = min(k, len(sims))
        part = np.argpartition(-sims, take - 1)[:take]
        return pa.table({id_col: pa.array(ids[part]), "cosine": pa.array(sims[part])})

    rows = ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True).take_all()
    best = heapq.nsmallest(k, rows, key=lambda r: (-r["cosine"], r[id_col]))
    return [(int(r[id_col]), float(r["cosine"])) for r in best]


def _prefix_sample(ds, emb_col: str, id_col: str, sample_rows: int) -> np.ndarray:
    """Deterministic training sample: rows with ``id_col < sample_rows``,
    sorted by id on the driver.  An order-free predicate, NOT ``limit()``:
    Ray's streaming executor delivers blocks in nondeterministic order, and
    k-means init depends on row order — a ``limit`` sample trains a
    different quantizer run-to-run."""
    import pyarrow.compute as pc

    def pick(tbl: pa.Table) -> pa.Table:
        return tbl.filter(pc.less(tbl.column(id_col), sample_rows))

    rows = (
        ds.select_columns([id_col, emb_col])
        .map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    rows.sort(key=lambda r: r[id_col])
    return np.asarray([r[emb_col] for r in rows], dtype=np.float64)


def _kmeans_cosine(sample: np.ndarray, n_centroids: int, seed: int,
                   iters: int) -> np.ndarray:
    """Deterministic spherical k-means (fixed iterations, seeded init,
    empty clusters keep their previous centroid).  Small sample only —
    runs on the driver, result broadcast once."""
    rng = np.random.default_rng(seed)
    S = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-30)
    idx = rng.choice(len(S), size=min(n_centroids, len(S)), replace=False)
    C = S[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(S @ C.T, axis=1)
        for c in range(len(C)):
            members = S[assign == c]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 1e-30:
                    C[c] = m / n
    return C


def ivf_topk(
    ds,
    query: np.ndarray,
    k: int = 10,
    *,
    n_centroids: int = 16,
    n_probe: int = 4,
    sample_rows: int = 2000,
    seed: int = 11,
    iters: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """IVF approximate top-k: a seeded spherical-k-means coarse quantizer is
    trained on a deterministic prefix sample (driver), centroids broadcast
    once (``ray.put``); each batch assigns rows to their nearest centroid
    and scores only rows whose centroid is among the query's ``n_probe``
    nearest lists.  At corpus scale the assignment becomes a stored
    partition column and the read prunes to the probed list directories
    (same deployment shape as ``lsh_topk``)."""
    import ray

    sample = _prefix_sample(ds, emb_col, id_col, sample_rows)
    C = _kmeans_cosine(sample, n_centroids, seed, iters)

    q = np.asarray(query, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    probe = np.sort(np.argsort(-(C @ qn))[:n_probe])
    ref = ray.put((qn, C, set(int(p) for p in probe)))

    def local(tbl: pa.Table) -> pa.Table:
        qv, cents, probes = ray.get(ref)
        M = _emb_matrix(tbl.column(emb_col))
        if M.shape[0] == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        norms = np.maximum(np.linalg.norm(M, axis=1), 1e-30)
        Mn = M / norms[:, None]
        assign = np.argmax(Mn @ cents.T, axis=1)
        mask = np.isin(assign, list(probes))
        M = M[mask]
        ids = np.asarray(tbl.column(id_col), dtype=np.int64)[mask]
        if M.shape[0] == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        sims = (M @ qv) / np.maximum(np.linalg.norm(M, axis=1), 1e-30)
        take = min(k, len(sims))
        part = np.argpartition(-sims, take - 1)[:take]
        return pa.table({id_col: pa.array(ids[part]), "cosine": pa.array(sims[part])})

    rows = ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True).take_all()
    best = heapq.nsmallest(k, rows, key=lambda r: (-r["cosine"], r[id_col]))
    return [(int(r[id_col]), float(r["cosine"])) for r in best]


def multi_query_topk(
    ds,
    query_ids,
    query_matrix,
    k: int = 5,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    scale_bits: int = 20,
):
    """kNN-graph strip: exact cosine top-k neighbors for a BOUNDED query set
    in ONE corpus stream (the batch form of similarity search — building a
    full kNN graph = running strips of Q queries; Q is the broadcast side).

    The query block (ids + matrix + norms) ships once via ``ray.put``; each
    batch computes one integer matmul and emits its LOCAL per-query top-k,
    so the driver merge sees Q x k x #blocks rows — never the corpus.

    Fixed-point contract (what makes the result bit-reproducible AND
    expressible as a pure-SQL oracle): every element is quantized
    ``floor(float64(v) * 2**scale_bits)`` — the multiply is exact for
    float32 inputs (power-of-two scale), so floor is unambiguous — and the
    dot products / squared norms are EXACT int64 arithmetic.  The only
    float steps, ``dot / sqrt(qn2 * en2)``, are single IEEE operations on
    exactly-known integers, identical in any engine (DuckDB included).
    Ranking ties break by ascending id.  Rows whose quantized norm is zero
    are excluded (cosine undefined).
    """
    import ray

    scale = float(1 << scale_bits)
    qids = np.asarray(query_ids, dtype=np.int64)
    Qi = np.floor(np.asarray(query_matrix, dtype=np.float64) * scale).astype(np.int64)
    if np.abs(Qi).max(initial=0) >= (1 << 25):
        raise ValueError(
            "multi_query_topk: query magnitude too large for "
            f"scale_bits={scale_bits}; normalize the column or lower it")
    qn2 = (Qi * Qi).sum(axis=1).astype(np.float64)
    q_ref = ray.put((qids, Qi, qn2))

    def local(tbl: pa.Table) -> pa.Table:
        qids_, Qi_, qn2_ = ray.get(q_ref)
        M = _emb_matrix(tbl.column(emb_col))
        empty = pa.table({"qid": pa.array([], pa.int64()),
                          id_col: pa.array([], pa.int64()),
                          "sim": pa.array([], pa.float64())})
        if M.shape[0] == 0:
            return empty
        Ei = np.floor(M * scale).astype(np.int64)
        if np.abs(Ei).max(initial=0) >= (1 << 25):
            # dot-product bound: 2^25 els over <=2^13 dims stay under 2^63
            raise ValueError(
                "multi_query_topk: input magnitude too large for "
                f"scale_bits={scale_bits}; normalize the column or lower it")
        en2 = (Ei * Ei).sum(axis=1).astype(np.float64)
        ids = np.asarray(tbl.column(id_col), dtype=np.int64)
        valid = en2 > 0
        if not valid.all():
            Ei, en2, ids = Ei[valid], en2[valid], ids[valid]
        if Ei.shape[0] == 0:
            return empty
        dots = Ei @ Qi_.T  # exact int64: |q| < 2^(scale_bits+6) per element
        sims = dots.astype(np.float64) / np.sqrt(en2[:, None] * qn2_[None, :])
        out_q, out_i, out_s = [], [], []
        for j in range(len(qids_)):
            s = sims[:, j].copy()
            s[ids == qids_[j]] = -np.inf  # exclude self
            take = min(k, len(s))
            part = np.argpartition(-s, take - 1)[:take]
            keep = part[np.isfinite(s[part])]
            out_q.append(np.full(len(keep), qids_[j], dtype=np.int64))
            out_i.append(ids[keep])
            out_s.append(s[keep])
        return pa.table({"qid": pa.array(np.concatenate(out_q)),
                         id_col: pa.array(np.concatenate(out_i)),
                         "sim": pa.array(np.concatenate(out_s))})

    rows = ds.map_batches(local, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(int(r["qid"]), []).append(r)
    out = []
    for qid in sorted(per_q):
        best = heapq.nsmallest(k, per_q[qid],
                               key=lambda r: (-r["sim"], r[id_col]))
        out.extend((qid, int(r[id_col]), float(r["sim"])) for r in best)
    return out
