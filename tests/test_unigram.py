"""Unigram-LM tokenizer (stages/unigram.py) — hard-EM trainer with exact
integer Viterbi.  No reference counterpart (training-data-pipeline surface);
spec shared with tools/gen_oracle_fixtures.py unigram_*_fixture."""

import pandas as pd
import pytest
import ray.data as rd

from great_expectations_ray.stages.unigram import (
    apply_unigram,
    train_unigram,
    train_unigram_from_words,
    viterbi_segment,
)


def _pows(total, n=16):
    return [total**j for j in range(n)]


def test_viterbi_prefers_high_count_long_pieces():
    counts = {"hel": 10, "lo": 10, "he": 8, "l": 3, "o": 2, "h": 1, "e": 1}
    total = sum(counts.values())
    assert viterbi_segment("hello", counts, _pows(total), 5) == ("hel", "lo")


def test_viterbi_tie_breaks_fewer_pieces_then_lex():
    # "abab": pieces ab (4) vs a,b singles — product 4*4=16/t^2 beats 1*1*1*1/t^4
    counts = {"ab": 4, "a": 1, "b": 1}
    total = sum(counts.values())
    assert viterbi_segment("abab", counts, _pows(total), 5) == ("ab", "ab")
    # exact tie in weight and k -> lexicographically smallest tuple wins:
    # "xy" with counts x*y == xy*total impossible; construct equal-weight
    # equal-k case via two equal-count pieces
    counts = {"aa": 5, "a": 5}
    total = sum(counts.values())
    # "aaaa": (aa,aa) weight 25/t^2 vs (a,a,aa)... k smaller wins anyway
    assert viterbi_segment("aaaa", counts, _pows(total), 5) == ("aa", "aa")


def test_unknown_single_char_coverage():
    counts = {"ab": 4, "a": 1, "b": 1}
    total = sum(counts.values())
    assert viterbi_segment("axb", counts, _pows(total), 5) == ("a", "x", "b")


def test_trainer_keeps_all_chars_and_caps_vocab():
    words = {"hello": 10, "hell": 5, "low": 7, "lower": 3, "he": 8}
    v = train_unigram_from_words(words, vocab_size=9, max_piece_len=4,
                                 em_iters=3, seed_size=50)
    chars = {"h", "e", "l", "o", "w", "r"}
    pieces = set(v["piece"])
    assert chars <= pieces
    assert len(v) <= 9
    # ranks are dense 0..n-1 in (cnt desc, piece asc) order
    assert list(v["rank"]) == list(range(len(v)))
    cnts = list(v["cnt"])
    assert cnts == sorted(cnts, reverse=True)


def test_trainer_empty_corpus():
    v = train_unigram_from_words({}, vocab_size=10)
    assert len(v) == 0


@pytest.fixture(scope="module")
def docs_ds():
    return rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text", "lang"])


def test_distributed_train_matches_fixture_spec(docs_ds):
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    from gen_oracle_fixtures import unigram_train_fixture

    docs_pd = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    eng = train_unigram(docs_ds, text_col="text", vocab_size=60,
                        max_piece_len=5, em_iters=3, seed_size=400)
    fix = unigram_train_fixture(docs_pd)
    pd.testing.assert_frame_equal(eng.reset_index(drop=True), fix)


def test_distributed_apply_matches_fixture_spec(docs_ds):
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    from gen_oracle_fixtures import unigram_apply_fixture

    docs_pd = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    vocab = train_unigram(docs_ds, text_col="text", vocab_size=60,
                          max_piece_len=5, em_iters=3, seed_size=400)
    toks = (apply_unigram(docs_ds, vocab, text_col="text", id_col="doc_id",
                          keep_cols=("lang",), max_piece_len=5)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    fix = unigram_apply_fixture(docs_pd).sort_values("doc_id").reset_index(drop=True)
    assert list(toks["doc_id"]) == list(fix["doc_id"])
    assert list(toks["unigram_tokens"]) == list(fix["unigram_tokens"])
    assert set(toks.columns) == {"doc_id", "lang", "unigram_tokens"}
