"""`python -m great_expectations_ray embed`: corpus -> seeded hashed-feature
embedding vectors, reusable space across runs."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import ray.data as rd

from great_expectations_ray.__main__ import main


def test_embed_verb_end_to_end(ray_session, tmp_path, capsys):
    docs = pd.DataFrame({
        "doc_id": range(6),
        "text": ["alpha beta gamma", "alpha beta gamma", "delta epsilon",
                 "", "zeta", "eta theta iota kappa"],
    })
    inp = str(tmp_path / "docs")
    rd.from_pandas(docs).repartition(2).write_parquet(inp)
    out = str(tmp_path / "emb")
    rc = main(["embed", "--input", inp, "--output", out,
               "--partitions", "2", "--cpus", "4"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows"] == 6 and stats["dim"] == 16

    got = rd.read_parquet(out).to_pandas().sort_values("doc_id")
    vecs = np.stack(got["text_emb"].map(np.asarray))
    assert vecs.shape == (6, 16) and vecs.dtype == np.float32
    # identical docs embed identically; empty doc -> zero vector;
    # a second run with the same seed lands in the SAME space
    np.testing.assert_array_equal(vecs[0], vecs[1])
    assert not np.any(vecs[3])
    out2 = str(tmp_path / "emb2")
    assert main(["embed", "--input", inp, "--output", out2,
                 "--partitions", "2", "--cpus", "4"]) == 0
    got2 = rd.read_parquet(out2).to_pandas().sort_values("doc_id")
    np.testing.assert_array_equal(
        np.stack(got2["text_emb"].map(np.asarray)), vecs)
