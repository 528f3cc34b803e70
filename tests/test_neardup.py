"""Near-dup family: MinHash-LSH, SimHash, n-gram Jaccard, embedding-cosine."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from great_expectations_ray.corpus import corpus_batch
from great_expectations_ray.stages.neardup import (
    band_keys,
    embedding_mark_duplicates,
    minhash_lsh_mark_duplicates,
    minhash_signatures,
    ngram_jaccard,
    simhash64,
    simhash_mark_duplicates,
)


def _corpus_ds(n=1000):
    import ray.data as rd

    t = corpus_batch(0, n).to_pandas()
    t["doc_id"] = t.path.str.extract(r"file_(\d+)\.").astype(int)
    return rd.from_pandas(t), t


def test_minhash_estimates_jaccard():
    a = "def process(data):\n    return sum(x.value for x in data)\n" * 4
    b = a.replace("process", "handle")
    true_j = ngram_jaccard(a, b, k=8)
    sigs = minhash_signatures(pa.array([a, b], pa.large_string()), num_perm=256)
    est = float((sigs[0] == sigs[1]).mean())
    assert abs(est - true_j) < 0.12


def test_minhash_flags_exact_dup_groups():
    ds, df = _corpus_ds(1000)
    out = minhash_lsh_mark_duplicates(ds, text_col="content", id_col="doc_id")
    marked = pd.DataFrame(out.take_all()).rename(columns={"max(is_neardup)": "is_neardup"})
    m = df.merge(marked, on="doc_id")
    # rows sharing identical canonical content: all but the smallest id flagged
    dup_groups = m[m.content.str.endswith("# canonical\n")].groupby("content")
    for _, g in dup_groups:
        if len(g) > 1:
            flags = g.sort_values("doc_id").is_neardup.tolist()
            assert flags[1:] == [True] * (len(g) - 1), g[["doc_id", "is_neardup"]]


def test_simhash_identical_and_different():
    a = "the quick brown fox jumps over the lazy dog " * 5
    c = "completely different content about databases and queries " * 5
    h = simhash64(pa.array([a, a, c], pa.string()))
    assert h[0] == h[1]
    assert bin(int(h[0]) ^ int(h[2])).count("1") > 10


def test_simhash_flags_exact_dups():
    ds, df = _corpus_ds(600)
    out = simhash_mark_duplicates(ds, text_col="content", id_col="doc_id")
    marked = pd.DataFrame(out.take_all()).rename(columns={"max(is_neardup)": "is_neardup"})
    m = df.merge(marked, on="doc_id")
    canon = m[m.content.str.endswith("# canonical\n")]
    for _, g in canon.groupby("content"):
        if len(g) > 1:
            assert g.sort_values("doc_id").is_neardup.tolist()[1:] == [True] * (len(g) - 1)


def test_ngram_jaccard_bounds():
    assert ngram_jaccard("abcdefghij", "abcdefghij") == 1.0
    assert ngram_jaccard("abcdefghij", "zzzzzzzzzz") == 0.0
    assert 0.0 < ngram_jaccard("abcdefghijklmno", "abcdefghijklmnX") < 1.0


def test_embedding_neardup_planted():
    import ray.data as rd

    rng = np.random.default_rng(3)
    base = rng.standard_normal((50, 16))
    planted = base[:10] + rng.standard_normal((10, 16)) * 0.01  # near-copies
    M = np.vstack([base, planted])
    t = pa.table({
        "vec_id": pa.array(np.arange(60), pa.int64()),
        "embedding": pa.array([list(map(float, row)) for row in M],
                              pa.list_(pa.float32())),
    })
    out = embedding_mark_duplicates(rd.from_arrow(t), id_col="vec_id",
                                    cosine_threshold=0.98, n_planes=6)
    marked = pd.DataFrame(out.take_all()).rename(columns={"max(is_neardup)": "is_neardup"})
    dup_ids = set(marked[marked.is_neardup].vec_id)
    planted_ids = set(range(50, 60))
    # LSH bucketing is approximate: most planted copies must be caught,
    # and no unplanted vector may be falsely flagged
    assert len(dup_ids & planted_ids) >= 7
    assert not (dup_ids - planted_ids)


def test_band_keys_shape():
    sigs = minhash_signatures(pa.array(["hello world example text"] * 3, pa.string()),
                              num_perm=64)
    bk = band_keys(sigs, bands=8)
    assert bk.shape == (3, 8)
    assert (bk[0] == bk[1]).all()


def test_minhash_jaccard_verified():
    """With a verification threshold, unrelated docs sharing a bucket by
    chance must NOT be marked; true near-dups must."""
    import ray.data as rd

    base = "def process(data):\n    return sum(x.value for x in data)\n" * 6
    near = base.replace("process", "handle")          # high jaccard
    other = "completely unrelated text about nothing in particular " * 8
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([base, near, other], pa.string()),
    })
    out = minhash_lsh_mark_duplicates(
        rd.from_arrow(t), text_col="text", id_col="doc_id",
        jaccard_threshold=0.5,
    )
    marked = {r["doc_id"]: bool(r["max(is_neardup)"]) for r in out.take_all()}
    assert marked[1] is False
    assert marked[2] is True      # near-dup of 1, verified above threshold
    assert marked[3] is False     # unrelated survives even if bucketed


def test_degenerate_bucket_capped():
    """A pathological bucket (thousands of identical docs) must complete in
    O(bucket) via the representative-verify cap, and still flag every
    non-first member."""
    import time

    import ray.data as rd

    n = 10_000
    t = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(["identical content repeated many times over " * 4] * n,
                         pa.string()),
    })
    t0 = time.time()
    out = minhash_lsh_mark_duplicates(
        rd.from_arrow(t), text_col="text", id_col="doc_id",
        jaccard_threshold=0.5, max_bucket_size=100,
    )
    marked = pd.DataFrame(out.take_all()).rename(
        columns={"max(is_neardup)": "is_neardup"})
    assert len(marked) == n
    assert marked.is_neardup.sum() == n - 1  # all but the lowest id
    assert time.time() - t0 < 120

    vec = [float(x) for x in np.arange(16)]
    te = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([vec] * n, pa.list_(pa.float32())),
    })
    out = embedding_mark_duplicates(
        rd.from_arrow(te), id_col="vec_id", cosine_threshold=0.9,
        max_bucket_size=100,
    )
    marked = pd.DataFrame(out.take_all()).rename(
        columns={"max(is_neardup)": "is_neardup"})
    assert marked.is_neardup.sum() == n - 1


def test_winnowing_fingerprints():
    """Winnowing guarantee: docs sharing a long substring share a
    fingerprint; disjoint docs (no common 8-gram) share none."""
    from great_expectations_ray.stages.fingerprint import winnow_fingerprints_batch

    shared = "the quick brown fox jumps over the lazy dog near the river bank"
    a = "PREFIX_A " + shared + " SUFFIX_AAA"
    b = "completely other opening text, " + shared + " and another ending"
    c = "zzzz " * 30  # no 8-gram in common with a/b
    fps, counts = winnow_fingerprints_batch(pa.array([a, b, c], pa.string()))
    sa, sb, sc = (set(f.tolist()) for f in fps)
    assert sa & sb, "shared substring must yield a common fingerprint"
    assert not (sa & sc) and not (sb & sc)
    assert counts[0] == len(a) - 7  # all 8-gram windows counted
    # short/empty docs: no windows, no fingerprints, no crash
    fps2, _ = winnow_fingerprints_batch(pa.array(["", "tiny"], pa.string()))
    assert [len(f) for f in fps2] == [0, 0]


def test_fingerprint_overlap_candidates_planted():
    import ray.data as rd

    from great_expectations_ray.stages.fingerprint import (
        fingerprint_overlap_candidates,
    )

    base = "def handler(request):\n    return process(request.data, flags=7)\n" * 3
    docs = [
        (1, base + "# one\n"),
        (2, base + "# two, a near copy\n"),
        (3, "entirely different content about databases " * 5),
    ]
    t = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([s for _, s in docs], pa.string()),
    })
    out = fingerprint_overlap_candidates(
        rd.from_arrow(t), id_col="doc_id", text_col="text", min_shared=2)
    pairs = {(r["id_a"], r["id_b"]): r["shared"] for r in out.take_all()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert not any(3 in p for p in pairs)


def test_winnowing_property_vs_naive():
    """Property check: the vectorized batch winnowing equals a naive
    per-doc python implementation on random byte strings."""
    import random

    from great_expectations_ray.stages.fingerprint import winnow_fingerprints_batch

    rng = random.Random(42)
    docs = [
        "".join(chr(rng.randrange(97, 123)) for _ in range(rng.randrange(0, 60)))
        for _ in range(50)
    ]
    fps, counts = winnow_fingerprints_batch(pa.array(docs, pa.string()), k=5, w=3)

    B, M64 = 1099511628211, (1 << 64) - 1
    for text, got, cnt in zip(docs, fps, counts):
        by = text.encode()
        hs = []
        for i in range(len(by) - 4):
            h = 0
            for j in range(5):
                h = (h * B + by[i + j]) & M64
            hs.append(h)
        assert cnt == max(len(by) - 4, 0)
        want = sorted({min(hs[i : i + 3]) for i in range(max(len(hs) - 2, 0))})
        assert got.tolist() == want, text


def test_ngram_jaccard_exact_verify_discriminates():
    """Exact-Jaccard stage: identical docs marked; a HIGH-but-sub-threshold
    near-dup that LSH-collides must NOT be marked (the exact verify prunes
    what the raw banding would flag); unrelated docs not marked."""
    import ray.data as rd

    from great_expectations_ray.stages.neardup import ngram_jaccard_mark_duplicates

    base = "def process(data):\n    return sum(x.value for x in data)\n" * 6
    exact = base
    near = base.replace("process", "handle")  # J ~= 0.8: collides, prunable
    other = "completely unrelated text about nothing in particular " * 8
    jn = ngram_jaccard(base, near, k=8)
    assert 0.5 < jn < 0.95
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([base, exact, near, other], pa.string()),
    })
    ds = rd.from_arrow(t)

    out = ngram_jaccard_mark_duplicates(
        ds, text_col="text", id_col="doc_id", threshold=0.99)
    marked = {r["doc_id"]: bool(r["max(is_neardup)"]) for r in out.take_all()}
    assert marked == {1: False, 2: True, 3: False, 4: False}

    # sanity: raw LSH banding WOULD have flagged the near copy
    raw = minhash_lsh_mark_duplicates(ds, text_col="text", id_col="doc_id")
    raw_marked = {r["doc_id"]: bool(r["max(is_neardup)"]) for r in raw.take_all()}
    assert raw_marked[3] is True

    # at a permissive threshold the same near copy IS marked
    out2 = ngram_jaccard_mark_duplicates(
        ds, text_col="text", id_col="doc_id", threshold=0.5)
    marked2 = {r["doc_id"]: bool(r["max(is_neardup)"]) for r in out2.take_all()}
    assert marked2 == {1: False, 2: True, 3: True, 4: False}


def test_ngram_jaccard_stage_empty_and_short_docs():
    """Docs shorter than shingle_k have empty shingle sets: they share the
    all-max signature, bucket together, and J(empty, empty) = 1.0 marks the
    non-minimal ones; a no-candidate corpus yields all False."""
    import ray.data as rd

    from great_expectations_ray.stages.neardup import ngram_jaccard_mark_duplicates

    t = pa.table({
        "doc_id": pa.array([10, 11, 12], pa.int64()),
        "text": pa.array(["ab", "cd", "x" * 500], pa.string()),
    })
    out = ngram_jaccard_mark_duplicates(
        rd.from_arrow(t), text_col="text", id_col="doc_id", threshold=0.9)
    marked = {r["doc_id"]: bool(r["max(is_neardup)"]) for r in out.take_all()}
    assert marked == {10: False, 11: True, 12: False}

    # fully distinct long docs: no pairs at all -> all False
    t2 = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([
            "alpha beta gamma delta epsilon zeta " * 10,
            "one two three four five six seven eight " * 10,
        ], pa.string()),
    })
    out2 = ngram_jaccard_mark_duplicates(
        rd.from_arrow(t2), text_col="text", id_col="doc_id")
    marked2 = {r["doc_id"]: bool(r["max(is_neardup)"]) for r in out2.take_all()}
    assert marked2 == {1: False, 2: False}


def test_ngram_jaccard_stage_matches_fixture_oracle():
    """Distributed stage output == the independent per-doc python-set
    reimplementation on a mixed synthetic corpus."""
    import sys

    import ray.data as rd

    sys.path.insert(0, "tools")
    from gen_oracle_fixtures import ngram_jaccard_fixture

    from great_expectations_ray.stages.neardup import ngram_jaccard_mark_duplicates

    _, df = _corpus_ds(400)
    docs = df.rename(columns={"content": "text"})[["doc_id", "text"]]
    expected = ngram_jaccard_fixture(docs, threshold=0.9)
    out = ngram_jaccard_mark_duplicates(
        rd.from_pandas(docs), text_col="text", id_col="doc_id", threshold=0.9)
    got = (pd.DataFrame(out.take_all())
           .rename(columns={"max(is_neardup)": "is_neardup"})
           .sort_values("doc_id").reset_index(drop=True))
    assert int(expected.is_neardup.sum()) > 0
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64", "is_neardup": bool}),
        expected.astype({"doc_id": "int64", "is_neardup": bool}),
    )


def test_mark_known_neardup_vs_snapshot():
    """Incremental near-dup vs snapshot: a lightly-edited copy of a snapshot
    doc is flagged (fuzzy), a fresh doc is not, and an exact copy is."""
    import ray

    from great_expectations_ray.stages.neardup import mark_known_neardup

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest before the sun sets tonight") * 3
    snap = ray.data.from_items([
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": "completely different snapshot content " * 8},
    ]).repartition(2)
    new = ray.data.from_items([
        {"doc_id": 10, "text": base},                      # exact copy
        {"doc_id": 11, "text": base.replace("lazy", "idle", 1)},  # near copy
        {"doc_id": 12, "text": "entirely novel text about volcanoes " * 9},
    ]).repartition(2)
    out = (mark_known_neardup(new, snap, text_col="text", id_col="doc_id")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [10, 11, 12]
    assert out["is_known"].tolist() == [True, True, False]


def test_mark_known_neardup_partition_invariance():
    """Verdicts are independent of block layout on either side."""
    import ray

    from great_expectations_ray.stages.neardup import mark_known_neardup

    docs = [{"doc_id": i, "text": f"document number {i} body " * (5 + i % 3)}
            for i in range(24)]
    snap_rows = docs[::2]
    new_rows = [dict(d, doc_id=d["doc_id"] + 100) for d in docs[1::2]]
    # every new doc whose text matches a snapshot doc's text is known;
    # make half of them copies of snapshot texts
    for j, d in enumerate(new_rows):
        if j % 2 == 0:
            d["text"] = snap_rows[j]["text"]

    def run(parts_a, parts_b):
        snap = ray.data.from_items(snap_rows).repartition(parts_a)
        new = ray.data.from_items(new_rows).repartition(parts_b)
        return (mark_known_neardup(new, snap, text_col="text", id_col="doc_id")
                .to_pandas().sort_values("doc_id").reset_index(drop=True))

    a = run(1, 1)
    b = run(5, 3)
    assert a.equals(b)
    assert a["is_known"].sum() >= len(new_rows) // 2


def test_optimal_bands_properties():
    """LSH S-curve tuning: sane divisor splits, monotone in threshold,
    fp_weight pushes toward fewer bands (stricter collision)."""
    from great_expectations_ray.stages.neardup import optimal_bands

    prev_b = None
    for t in (0.2, 0.4, 0.6, 0.8, 0.95):
        b, r = optimal_bands(128, t)
        assert b * r == 128
        if prev_b is not None:
            assert b <= prev_b  # higher threshold -> fewer bands
        prev_b = b
    b_bal, _ = optimal_bands(128, 0.5)
    b_fp, _ = optimal_bands(128, 0.5, fp_weight=0.95)
    assert b_fp <= b_bal
    import pytest as _pytest
    with _pytest.raises(ValueError):
        optimal_bands(128, 1.5)


def test_minhash_auto_bands(ray_session):
    """bands="auto" resolves to the tuned split and still marks twins."""
    import ray

    from great_expectations_ray.stages.neardup import (
        minhash_lsh_mark_duplicates,
    )

    docs = [{"doc_id": i,
             "text": f"totally distinct document body {i} " * 6}
            for i in range(10)]
    docs.append({"doc_id": 10, "text": docs[0]["text"]})  # exact twin
    ds = ray.data.from_items(docs).repartition(3)
    out = (minhash_lsh_mark_duplicates(
            ds, text_col="text", id_col="doc_id",
            bands="auto", jaccard_threshold=0.7)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert bool(out.loc[out.doc_id == 10, "max(is_neardup)"].iloc[0])
    assert not out.loc[out.doc_id < 10, "max(is_neardup)"].any()
    with pytest.raises(ValueError, match="auto"):
        minhash_lsh_mark_duplicates(ds, text_col="text", id_col="doc_id",
                                    bands="auto")
