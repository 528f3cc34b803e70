"""Entropy secret scanner (stages/secrets_entropy.py) — differential vs an
independent per-doc reimplementation, boundary handling, thresholds."""

from __future__ import annotations

import base64
import hashlib
import math
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import ray

from great_expectations_ray.stages.secrets_entropy import (
    B64_THRESHOLD,
    HEX_THRESHOLD,
    MIN_LEN,
    scan_secrets,
    secret_stats_table,
)

_NAIVE_RE = re.compile(r"[A-Za-z0-9+/=_-]{20,}")


def _naive(doc: str) -> tuple[int, int, int]:
    """Independent reimplementation: per-doc regex + dict-counter entropy."""
    n_c = n_hex = n_hi = 0
    for m in _NAIVE_RE.finditer(doc or ""):
        cand = m.group(0)
        n_c += 1
        is_hex = re.fullmatch(r"[0-9a-fA-F]+", cand) is not None
        n_hex += is_hex
        counts = Counter(cand)
        h = -sum(
            (c / len(cand)) * math.log2(c / len(cand)) for c in counts.values()
        )
        thr = HEX_THRESHOLD if is_hex else B64_THRESHOLD
        n_hi += h >= thr
    return n_c, n_hex, n_hi


def _docs_fixture() -> list:
    md5s = [hashlib.md5(str(i).encode()).hexdigest() for i in range(30)]
    b64s = [
        base64.b64encode(hashlib.md5(str(i).encode()).digest()).decode()
        + base64.b64encode(hashlib.md5(str(i + 1).encode()).digest()).decode()
        for i in range(10)
    ]
    return [
        "no candidates here at all",
        "",
        None,
        "token = \"" + md5s[0] + "\"",                      # hex, high entropy
        "a" * 40,                                            # low entropy b64-class
        "key: " + b64s[0],                                   # long b64 secret
        "SPDX-License-Identifier-and-more-hyphenated-run",   # english-ish run
        "short_hex deadbeefcafe",                            # < 20 chars: no hit
        "two " + md5s[1] + " and " + b64s[1] + " in one",
        "unicode départ " + md5s[2] + " fin",
        "edge" + "0" * 25,                                   # repeated-digit hex run
        " ".join(md5s[3:8]),
    ]


def test_secret_stats_matches_naive():
    docs = _docs_fixture()
    out = secret_stats_table(pa.array(docs, pa.string()))
    got = list(
        zip(
            out["n_secret_candidates"].to_pylist(),
            out["n_hex_candidates"].to_pylist(),
            out["n_high_entropy"].to_pylist(),
        )
    )
    want = [_naive(d) for d in docs]
    assert got == [tuple(w) for w in want]
    # sanity: the fixture actually exercises every class
    tot_c = sum(w[0] for w in want)
    tot_hex = sum(w[1] for w in want)
    tot_hi = sum(w[2] for w in want)
    assert tot_c >= 10 and 0 < tot_hex < tot_c and 0 < tot_hi < tot_c


def test_candidates_never_span_rows():
    # adjacent rows whose buffer bytes abut: the run must split per row
    docs = ["x" * 30, "y" * 30, "z" * 10]  # z-run < 20 after split: dropped
    out = secret_stats_table(pa.array(docs, pa.string()))
    assert out["n_secret_candidates"].to_pylist() == [1, 1, 0]
    # and a sliced (offset != 0) array gives the same answer
    arr = pa.array(["pad"] + docs, pa.string()).slice(1)
    out2 = secret_stats_table(arr)
    assert out2["n_secret_candidates"].to_pylist() == [1, 1, 0]


def test_threshold_classes():
    md5hex = hashlib.md5(b"seed").hexdigest()          # ~3.7 bits/char hex
    out = secret_stats_table(
        pa.array([md5hex, "0" * 32, "abc-def-ghi-jkl-mno-pqr"], pa.string())
    )
    assert out["n_hex_candidates"].to_pylist() == [1, 1, 0]
    # random hex over the bar, constant hex under it, english-ish b64 under 4.5
    assert out["n_high_entropy"].to_pylist() == [1, 0, 0]


def test_scan_secrets_ray_stage():
    docs = _docs_fixture() * 50
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(docs))),
                  "content": pa.array(docs, pa.string())})
    ).repartition(4)
    out = scan_secrets(ds, column="content").to_pandas().sort_values("doc_id")
    want = [_naive(d) for d in docs]
    assert out["n_secret_candidates"].tolist() == [w[0] for w in want]
    assert out["n_hex_candidates"].tolist() == [w[1] for w in want]
    assert out["n_high_entropy"].tolist() == [w[2] for w in want]


def test_scan_cli(tmp_path, capsys):
    import json

    import pyarrow.parquet as pq

    from great_expectations_ray.__main__ import main

    docs = _docs_fixture()
    src = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table({"doc_id": list(range(len(docs))),
                  "text": pa.array(docs, pa.string())}), src)

    out = str(tmp_path / "scan_out")
    rc = main(["scan", "--input", src, "--output", out,
               "--partitions", "2", "--fail-on-hit"])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1                      # fixture contains real secrets
    assert summary["files"] == len(docs)
    want = [_naive(d) for d in docs]
    assert summary["total_candidates"] == sum(w[0] for w in want)
    assert summary["total_high_entropy"] == sum(w[2] for w in want)
    assert summary["files_with_high_entropy"] == sum(1 for w in want if w[2])
    stats = pq.read_table(out)
    assert stats.num_rows == len(docs)
    assert set(stats.schema.names) == {
        "doc_id", "n_secret_candidates", "n_hex_candidates", "n_high_entropy"}

    # a clean corpus passes the gate
    clean = str(tmp_path / "clean.parquet")
    pq.write_table(
        pa.table({"doc_id": [1, 2], "text": ["hello", "world"]}), clean)
    assert main(["scan", "--input", clean, "--fail-on-hit"]) == 0
