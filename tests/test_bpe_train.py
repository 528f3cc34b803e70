"""Distributed BPE tokenizer training + apply."""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pyarrow as pa

from great_expectations_ray.stages.bpe_train import (
    _merge_loop,
    apply_bpe,
    encode_word,
    train_bpe,
)

sys.path.insert(0, "tools")


def test_merge_loop_classic_example():
    # Sennrich's canonical corpus: "low lower newest widest" family
    words = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = _merge_loop(words, num_merges=10, min_pair_count=2)
    pairs = [(l, r) for _, l, r, _ in merges]
    # 'es' (newest 6 + widest 3 = 9) must win the first merge, then 'est'
    assert pairs[0] == ("e", "s")
    assert pairs[1] == ("es", "t")
    counts = [c for *_, c in merges]
    assert counts[0] == 9 and counts[1] == 9
    # 'lo' (low 5 + lower 2 = 7) next
    assert pairs[2] == ("l", "o")


def test_merge_loop_deterministic_tie_break():
    # both pairs have count 2: lexicographically smallest must win
    words = {"ab": 2, "cd": 2}
    merges = _merge_loop(words, num_merges=2, min_pair_count=2)
    assert [(l, r) for _, l, r, _ in merges] == [("a", "b"), ("c", "d")]


def test_merge_loop_min_count_stops():
    words = {"abc": 1, "xyz": 1}
    assert _merge_loop(words, num_merges=5, min_pair_count=2) == []


def test_incremental_matches_naive_recount():
    """The stage's incremental index loop == the fixture's naive
    recount-per-round loop on a randomized corpus."""
    from gen_oracle_fixtures import bpe_train_fixture

    rng = np.random.default_rng(5)
    vocab = ["".join(rng.choice(list("abcdef"), size=rng.integers(2, 9)))
             for _ in range(300)]
    texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(50)]
    docs = pd.DataFrame({"text": texts})
    expected = bpe_train_fixture(docs, num_merges=40, max_words=1000)

    counts: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            counts[w] = counts.get(w, 0) + 1
    got = _merge_loop(counts, num_merges=40, min_pair_count=2)
    got_df = pd.DataFrame(
        [{"rank": r, "pair": l + " " + rr, "cnt": c} for r, l, rr, c in got]
    )
    pd.testing.assert_frame_equal(
        got_df.astype({"rank": "int64", "cnt": "int64"}), expected)


def test_train_bpe_distributed_matches_fixture():
    from gen_oracle_fixtures import bpe_train_fixture

    import ray.data as rd

    rng = np.random.default_rng(9)
    vocab = ["lower", "lowest", "newer", "newest", "wide", "widest",
             "process", "handle", "data", "value"]
    texts = [" ".join(rng.choice(vocab, size=25)) for _ in range(200)]
    docs = pd.DataFrame({"text": texts})
    expected = bpe_train_fixture(docs, num_merges=30)

    ds = rd.from_pandas(docs).repartition(8)  # force cross-block combining
    m = train_bpe(ds, text_col="text", num_merges=30)
    got = pd.DataFrame({"rank": m["rank"], "pair": m["left"] + " " + m["right"],
                        "cnt": m["cnt"]})
    pd.testing.assert_frame_equal(got, expected)


def test_train_bpe_top_k_cut_is_deterministic():
    import ray.data as rd

    docs = pd.DataFrame({"text": ["aa bb cc dd ee ff"] * 4})
    # max_words smaller than vocab: cut keeps (count desc, word asc) prefix
    m1 = train_bpe(rd.from_pandas(docs), text_col="text", num_merges=3,
                   max_words=3)
    m2 = train_bpe(rd.from_pandas(docs).repartition(4), text_col="text",
                   num_merges=3, max_words=3)
    pd.testing.assert_frame_equal(m1, m2)
    # ties on count -> lexicographic: aa, bb, cc survive the cut
    assert [(l, r) for l, r in zip(m1["left"], m1["right"])] == [
        ("a", "a"), ("b", "b"), ("c", "c")]


def test_encode_word_and_apply():
    import ray.data as rd

    words = {"lower": 4, "lowest": 4, "low": 4}
    merges = _merge_loop(words, num_merges=6, min_pair_count=2)
    ranks = {(l, r): k for k, l, r, _ in merges}
    assert encode_word("low", ranks) == ["low"]
    assert "".join(encode_word("lowest", ranks)) == "lowest"
    assert len(encode_word("lowest", ranks)) < len("lowest")
    # unseen word falls back to characters (no applicable merges)
    assert encode_word("zzq", ranks) == ["z", "z", "q"]

    mdf = pd.DataFrame(merges, columns=["rank", "left", "right", "cnt"])
    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["low lower lowest", "zzq"], pa.string()),
    })
    out = apply_bpe(rd.from_arrow(t), mdf, text_col="text", id_col="doc_id")
    got = {r["doc_id"]: r["bpe_tokens"] for r in out.take_all()}
    exp1 = sum(len(encode_word(w, ranks)) for w in ["low", "lower", "lowest"])
    assert got == {1: exp1, 2: 3}


def test_apply_matches_sequential_fixture_apply(ray_session):
    """Stage apply (lowest-rank rescans, per-actor cache) == the fixture's
    sequential rank-order application on a randomized corpus."""
    from gen_oracle_fixtures import bpe_apply_fixture

    import ray.data as rd

    rng = np.random.default_rng(13)
    vocab = ["".join(rng.choice(list("abcdefgh"), size=rng.integers(2, 10)))
             for _ in range(200)]
    texts = [" ".join(rng.choice(vocab, size=20)) for _ in range(120)]
    docs = pd.DataFrame({"doc_id": range(120), "text": texts})
    expected = bpe_apply_fixture(docs, num_merges=40)

    from great_expectations_ray.stages.bpe_train import apply_bpe, train_bpe
    ds = rd.from_pandas(docs).repartition(5)
    merges = train_bpe(ds, text_col="text", num_merges=40)
    got = (apply_bpe(ds, merges, text_col="text", id_col="doc_id")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64", "bpe_tokens": "int64"}), expected)


def test_word_counts_driver_and_exchange_paths_identical():
    """The under-cap driver fast path and the bucketed-exchange path of
    distributed_word_counts feed train_bpe identically (exact integer sums,
    same deterministic top-K), so the learned merge tables must be equal."""
    import ray.data as rd

    from great_expectations_ray.stages.bpe_train import distributed_word_counts

    rng = np.random.default_rng(11)
    vocab = [f"w{i:03d}" for i in range(40)]
    docs = pd.DataFrame({
        "text": [" ".join(rng.choice(vocab, size=rng.integers(3, 30)))
                 for _ in range(300)],
    })
    ds = rd.from_pandas(docs).repartition(6)
    fast = distributed_word_counts(ds, text_col="text", max_words=25
                                   ).to_pandas()
    slow = distributed_word_counts(ds, text_col="text", max_words=25,
                                   max_driver_rows=0).to_pandas()
    key = ["cnt", "word"]
    fast = fast.sort_values(key, ascending=[False, True],
                            kind="mergesort").head(25).reset_index(drop=True)
    slow = slow.sort_values(key, ascending=[False, True],
                            kind="mergesort").head(25).reset_index(drop=True)
    pd.testing.assert_frame_equal(fast[["word", "cnt"]],
                                  slow[["word", "cnt"]])
    # and the full trainer path over each is identical
    m_fast = train_bpe(ds, text_col="text", num_merges=5, max_words=25)
    ref = (pd.Series(" ".join(docs["text"]).split()).value_counts())
    assert set(fast["word"]) <= set(ref.index)
    for w, c in zip(fast["word"], fast["cnt"]):
        assert ref[w] == c
    assert len(m_fast) == 5
