"""WordPiece tokenizer (stages/wordpiece.py) — likelihood-gain merge trainer
+ greedy longest-match-first apply.  No reference counterpart (training-data-
pipeline surface); spec shared with tools/gen_oracle_fixtures.py
wordpiece_*_fixture (naive full-recount reimplementation)."""

import pandas as pd
import pytest
import ray.data as rd

from great_expectations_ray.stages.wordpiece import (
    UNK,
    apply_wordpiece,
    encode_word,
    train_wordpiece,
    train_wordpiece_from_words,
    wordpiece_merge_loop,
)


def test_merge_prefers_likelihood_gain_over_raw_count():
    # "ab" appears 10x; "cd" appears 6x — but c and d occur ONLY together,
    # so score(c,##d) = 6/(6*6) = 1/6 beats score(a,##b) = 10/(20*10) = 1/20.
    # Classic WordPiece-vs-BPE discriminator: BPE would merge (a,##b) first.
    words = {"ab": 10, "ax": 10, "cd": 6}
    seeds, merges = wordpiece_merge_loop(words, num_merges=1)
    assert merges[0][1:4] == ("c", "##d", "cd")


def test_merge_tie_breaks_count_then_lex():
    # two pairs with identical exact score and count -> lexicographic
    words = {"ab": 4, "cd": 4}
    seeds, merges = wordpiece_merge_loop(words, num_merges=2)
    assert [m[3] for m in merges] == ["ab", "cd"]


def test_continuation_prefix_propagates_through_merges():
    # merging (##b, ##c) keeps the ## prefix; then (a, ##bc) strips it
    words = {"abc": 9}
    seeds, merges = wordpiece_merge_loop(words, num_merges=2,
                                         min_pair_count=1)
    pieces = [m[3] for m in merges]
    assert len(pieces) == 2
    assert pieces[-1] == "abc"
    assert all(p == "abc" or p.startswith("##") or p[0] == "a"
               for p in pieces)


def test_vocab_frame_shape():
    words = {"hello": 10, "hell": 5, "help": 7}
    v = train_wordpiece_from_words(words, num_merges=4)
    assert list(v.columns) == ["rank", "piece", "cnt"]
    assert list(v["rank"]) == list(range(len(v)))
    # seed symbols come first, sorted ascending: h ##e ##l ##o ##p ->
    # "##e" before "##l"
    assert v["piece"].iloc[0] == "##e" and v["piece"].iloc[1] == "##l"
    # every character symbol of the corpus is in the vocab
    assert {"h", "##e", "##l", "##o", "##p"} <= set(v["piece"])


def test_encode_greedy_longest_match():
    vocab = {"un", "##aff", "##able", "##a", "##f", "##l", "##e", "##b",
             "unaff"}
    assert encode_word("unaffable", vocab) == ["unaff", "##able"]
    # no piece covering position -> whole word is UNK
    assert encode_word("unqqq", vocab) == [UNK]
    assert encode_word("", vocab) == [UNK]


def test_encode_single_chars_roundtrip():
    vocab = {"a", "##b", "##c"}
    assert encode_word("abc", vocab) == ["a", "##b", "##c"]


@pytest.fixture(scope="module")
def docs_ds():
    return rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text", "lang"])


def _tools_path():
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))


def test_distributed_train_matches_fixture_spec(docs_ds):
    _tools_path()
    from gen_oracle_fixtures import wordpiece_train_fixture

    docs_pd = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    eng = train_wordpiece(docs_ds, text_col="text", num_merges=60)
    fix = wordpiece_train_fixture(docs_pd)
    pd.testing.assert_frame_equal(eng.reset_index(drop=True), fix)


def test_distributed_apply_matches_fixture_spec(docs_ds):
    _tools_path()
    from gen_oracle_fixtures import wordpiece_apply_fixture

    docs_pd = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    vocab = train_wordpiece(docs_ds, text_col="text", num_merges=60)
    toks = (apply_wordpiece(docs_ds, vocab, text_col="text", id_col="doc_id",
                            keep_cols=("lang",))
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    fix = wordpiece_apply_fixture(docs_pd).sort_values(
        "doc_id").reset_index(drop=True)
    assert list(toks["doc_id"]) == list(fix["doc_id"])
    assert list(toks["wordpiece_tokens"]) == list(fix["wordpiece_tokens"])
    assert set(toks.columns) == {"doc_id", "lang", "wordpiece_tokens"}
