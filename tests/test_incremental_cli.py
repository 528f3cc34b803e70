"""Day-2 incremental intake scenario (`python -m great_expectations_ray
incremental`): corpus diff -> persisted-bloom incremental dedup -> drift
gate, chained as ONE CLI flow over a snapshot pair."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def _write(tmp_path, name, df):
    p = str(tmp_path / name)
    rd.from_pandas(df).repartition(2).write_parquet(p)
    return p


@pytest.fixture()
def snapshot_pair(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    snap = pd.DataFrame({
        "doc_id": np.arange(100, dtype=np.int64),
        "text": [f"snapshot document number {i} body text" for i in range(100)],
        "score": rng.normal(10.0, 1.0, 100),
    })
    # day-2 intake: 20 exact re-crawls of snapshot docs, 30 novel docs,
    # and a clearly shifted score distribution for the drift gate
    today = pd.DataFrame({
        "doc_id": np.arange(200, 250, dtype=np.int64),
        "text": ([f"snapshot document number {i} body text" for i in range(20)]
                 + [f"fresh day-two document {i} content" for i in range(30)]),
        "score": rng.normal(30.0, 1.0, 50),  # big shift: PSI must fire
    })
    return (_write(tmp_path, "snap", snap), _write(tmp_path, "today", today))


def test_incremental_day2_flow(snapshot_pair, tmp_path, capsys):
    from great_expectations_ray.__main__ import main

    snap_p, today_p = snapshot_pair
    bloom_p = str(tmp_path / "state" / "corpus.bloom")
    out1 = str(tmp_path / "out_day2")

    rc = main(["incremental", "--snapshot", snap_p, "--input", today_p,
               "--output", out1, "--bloom", bloom_p,
               "--id-col", "doc_id", "--text-col", "text",
               "--psi-columns", "score", "--partitions", "2"])
    rep = json.loads(capsys.readouterr().out)
    # drift gate fired (score shifted 10 -> 30): exit 1, but survivors wrote
    assert rc == 1
    assert rep["drift"]["drifted"] and rep["drift"]["psi"]["score"]["drifted"]
    # diff: 30 added, 20 unchanged re-crawls... by id the re-crawls have NEW
    # ids, so they count as added too; all 100 snapshot ids are removed
    assert rep["diff"]["added"] == 50 and rep["diff"]["removed"] == 100
    # dedup: the 20 exact re-crawls (same text, new id) drop
    assert rep["dedup"] == {"rows_in": 50, "known_dropped": 20,
                            "near_dropped": 0, "rows_out": 30}
    assert rep["bloom"]["state"] == "built+updated"
    assert os.path.exists(bloom_p)
    survivors = rd.read_parquet(out1).to_pandas()
    assert len(survivors) == 30
    assert survivors["doc_id"].dtype.kind == "i"  # dtypes survive the join
    assert all(t.startswith("fresh day-two") for t in survivors["text"])


def test_incremental_day3_loads_persisted_filter(snapshot_pair, tmp_path,
                                                 capsys):
    """Second run against the saved filter: state == loaded, and docs that
    were novel YESTERDAY are pruned by the updated filter contents."""
    from great_expectations_ray.__main__ import main

    snap_p, today_p = snapshot_pair
    bloom_p = str(tmp_path / "state" / "corpus.bloom")
    main(["incremental", "--snapshot", snap_p, "--input", today_p,
          "--output", str(tmp_path / "o1"), "--bloom", bloom_p,
          "--partitions", "2"])
    capsys.readouterr()

    # day-3 intake: one of yesterday's novel docs re-crawled + one snapshot
    # doc + one brand-new doc.  The exact verify runs against --snapshot, so
    # yesterday's novel doc is bloom-hit but NOT snapshot-verified: kept.
    # (The filter prunes; the snapshot remains the equality source of truth.)
    day3 = pd.DataFrame({
        "doc_id": np.array([900, 901, 902], dtype=np.int64),
        "text": ["fresh day-two document 5 content",
                 "snapshot document number 7 body text",
                 "never seen before content at all"],
    })
    day3_p = _write(tmp_path, "day3", day3)
    rc = main(["incremental", "--snapshot", snap_p, "--input", day3_p,
               "--output", str(tmp_path / "o2"), "--bloom", bloom_p,
               "--partitions", "1"])
    rep = json.loads(capsys.readouterr().out)
    # the profile gate rightly flags day3 (new id range, score column gone);
    # the exit code reflects it — survivors are still written either way
    assert rc == 1 and rep["drift"]["drifted"]
    assert rep["bloom"]["state"] == "loaded+updated"
    assert rep["dedup"]["known_dropped"] == 1  # the snapshot doc only
    kept = sorted(rd.read_parquet(str(tmp_path / "o2")).to_pandas()["doc_id"])
    assert kept == [900, 902]


def test_incremental_near_flag_drops_snapshot_neardups(ray_session, tmp_path,
                                                       capsys):
    """--near also drops docs that are MinHash near-duplicates of snapshot
    docs (small edits of a snapshot doc, not byte-identical)."""
    from great_expectations_ray.__main__ import main

    base = ("the quick brown fox jumps over the lazy dog again and again "
            "while seventeen violet zeppelins hover above the quiet harbor "
            "and a clockwork owl recites prime numbers to the tide")
    snap = pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64),
        "text": [f"{base} snapshot variant {i}" for i in range(10)],
    })
    today = pd.DataFrame({
        "doc_id": np.array([100, 101], dtype=np.int64),
        # 100: tiny edit of a snapshot doc (near-dup, not exact);
        # 101: unrelated content
        "text": [f"{base} snapshot variant 3 EDITED",
                 "completely different text about cooking rice properly "
                 "with precise water ratios and resting times for dinner"],
    })
    snap_p = _write(tmp_path, "nsnap", snap)
    today_p = _write(tmp_path, "ntoday", today)
    rc = main(["incremental", "--snapshot", snap_p, "--input", today_p,
               "--output", str(tmp_path / "nout"), "--near",
               "--partitions", "1"])
    rep = json.loads(capsys.readouterr().out)
    assert rep["dedup"]["known_dropped"] == 0  # nothing byte-identical
    assert rep["dedup"]["near_dropped"] == 1
    kept = rd.read_parquet(str(tmp_path / "nout")).to_pandas()
    assert kept["doc_id"].tolist() == [101]
