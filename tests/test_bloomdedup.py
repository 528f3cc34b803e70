from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from great_expectations_ray.stages.bloomdedup import (
    bloom_maybe,
    bloom_set,
    build_bloom,
    key_hash64,
    mark_known,
)


def test_bloom_no_false_negatives_and_low_fp():
    rng = np.random.default_rng(3)
    members = rng.integers(0, 2**63, size=5000, dtype=np.uint64)
    others = rng.integers(0, 2**63, size=5000, dtype=np.uint64)
    others = others[~np.isin(others, members)]
    words = bloom_set(members, 1 << 18, 4)
    assert bloom_maybe(words, members, 1 << 18, 4).all()  # zero false negatives
    fp = bloom_maybe(words, others, 1 << 18, 4).mean()
    # m/n ≈ 52 bits/key, k=4 → theoretical FP ≈ (1-e^{-4/52})^4 ≈ 3e-5
    assert fp < 0.01


def test_key_hash64_string_vs_int_kinds():
    s = pa.array(["a", "b", "", "a"])
    h = key_hash64(s)
    assert h[0] == h[3] and h[0] != h[1] and h[2] not in (h[0], h[1])
    i = pa.array([1, 2, 1], pa.int64())
    hi = key_hash64(i)
    assert hi[0] == hi[2] and hi[0] != hi[1]


def test_mark_known_exact_membership():
    snap_keys = [f"k{i}" for i in range(0, 100, 2)]  # even keys known
    new_keys = [f"k{i}" for i in range(100)]
    snap = rd.from_arrow(pa.table({"k": pa.array(snap_keys)})).repartition(3)
    new = rd.from_arrow(
        pa.table({"id": pa.array(range(100), pa.int64()), "k": pa.array(new_keys)})
    ).repartition(4)
    out = (
        mark_known(new, snap, key_col="k", id_col="id")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert len(out) == 100
    expected = pd.Series([i % 2 == 0 for i in range(100)])
    assert (out["is_known"].reset_index(drop=True) == expected).all()


def test_mark_known_all_novel_and_empty_snapshot():
    snap = rd.from_arrow(pa.table({"k": pa.array([], pa.string())}))
    new = rd.from_arrow(
        pa.table({"id": pa.array([1, 2], pa.int64()), "k": pa.array(["x", "y"])})
    )
    out = mark_known(new, snap, key_col="k", id_col="id").to_pandas()
    assert len(out) == 2 and not out["is_known"].any()


def test_build_bloom_matches_local():
    tbl = pa.table({"k": pa.array([f"v{i}" for i in range(500)])})
    ds = rd.from_arrow(tbl).repartition(5)
    words = build_bloom(ds, "k", num_bits=1 << 16, num_hashes=3)
    local = bloom_set(key_hash64(tbl.column("k").combine_chunks()), 1 << 16, 3)
    assert (words == local).all()


def test_bloom_save_load_roundtrip(tmp_path):
    import numpy as np

    from great_expectations_ray.stages.bloomdedup import (
        bloom_maybe,
        bloom_set,
        key_hash64,
        load_bloom,
        save_bloom,
    )
    import pyarrow as pa

    keys = pa.array([f"key-{i}" for i in range(500)])
    h = key_hash64(keys)
    words = bloom_set(h, 1 << 16, 4)
    path = str(tmp_path / "state" / "snapshot.bloom")
    save_bloom(words, path, num_hashes=4)

    w2, num_bits, num_hashes = load_bloom(path)
    assert (num_bits, num_hashes) == (1 << 16, 4)
    assert np.array_equal(w2, words)
    # membership behavior identical after the round trip
    probe = key_hash64(pa.array(["key-3", "key-499", "absent-a", "absent-b"]))
    assert np.array_equal(bloom_maybe(w2, probe, num_bits, num_hashes),
                          bloom_maybe(words, probe, 1 << 16, 4))
    assert bloom_maybe(w2, probe, num_bits, num_hashes)[:2].all()


def test_load_bloom_rejects_garbage(tmp_path):
    import pytest

    from great_expectations_ray.stages.bloomdedup import load_bloom

    p = tmp_path / "not_a_bloom"
    p.write_bytes(b"hello world")
    with pytest.raises(ValueError, match="not a saved bloom"):
        load_bloom(str(p))


def test_bloom_on_disk_format_is_little_endian(tmp_path):
    """The persisted layout is pinned '<u8' so a filter written on one host
    loads bit-identically on an opposite-endian host."""
    import numpy as np

    from great_expectations_ray.stages.bloomdedup import (
        _BLOOM_MAGIC,
        load_bloom,
        save_bloom,
    )

    words = np.array([0x0102030405060708, 0xF0E0D0C0B0A09080], dtype=np.uint64)
    path = str(tmp_path / "b.bloom")
    save_bloom(words, path, num_hashes=3)
    raw = open(path, "rb").read()
    off = len(_BLOOM_MAGIC)
    # header and payload bytes must match an explicit little-endian encoding
    assert raw[off:off + 8] == (len(words) << 6).to_bytes(8, "little")
    assert raw[off + 8:off + 16] == (3).to_bytes(8, "little")
    assert raw[off + 16:off + 24] == (0x0102030405060708).to_bytes(8, "little")
    w2, num_bits, num_hashes = load_bloom(path)
    assert np.array_equal(w2, words) and w2.dtype == np.uint64
    assert w2.flags.writeable  # astype copy: safe to mutate after load
