"""Property-based checks (hypothesis) for the session's new kernels:
Luhn validation, top-fraction selection, dictionary matching, mojibake
round-trip."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from great_expectations_ray.stages.dictmatch import PhraseDict, match_counts
from great_expectations_ray.stages.luhn import luhn_valid
from great_expectations_ray.stages.normalize import fix_mojibake_array
from great_expectations_ray.stages.topfrac import _threshold_params_driver


def _luhn_reference(digits: str) -> bool:
    """Independent reversed-digits formulation."""
    if not (13 <= len(digits) <= 19):
        return False
    total = 0
    for i, ch in enumerate(reversed(digits)):
        d = int(ch)
        if i % 2 == 1:
            d = d * 2
            d = d - 9 if d > 9 else d
        total += d
    return total % 10 == 0


@given(st.text(alphabet="0123456789", min_size=1, max_size=25))
@settings(max_examples=300, deadline=None)
def test_luhn_matches_reference(digits):
    assert luhn_valid(digits) == _luhn_reference(digits)


@given(st.lists(st.floats(allow_nan=False, allow_infinity=False,
                          width=32),
                min_size=1, max_size=200),
       st.integers(min_value=1, max_value=200))
@settings(max_examples=200, deadline=None)
def test_threshold_params_match_lexsort_selection(scores, n):
    """(t, id_cut) reproduces the ROW_NUMBER(score DESC, id) <= N set."""
    scores = np.asarray(scores, dtype=np.float64)
    ids = np.arange(len(scores), dtype=np.int64)
    N = min(n, len(scores))
    t, id_cut = _threshold_params_driver(ids, scores, N)
    sel = scores > t
    if id_cut is not None:
        sel |= (scores == t) & (ids <= id_cut)
    expect = set(pd.DataFrame({"id": ids, "s": scores})
                 .sort_values(["s", "id"], ascending=[False, True],
                              kind="mergesort")["id"].head(N))
    assert sel.sum() == N
    assert set(ids[sel]) == expect


_WORDS = ["alpha", "beta", "gamma", "delta", "spark", "dup"]


def _naive_match_count(text: str, phrases: set[str]) -> int:
    toks = [t for t in __import__("re").split(r"[^a-z0-9_]+", text.lower())
            if t]
    cnt = 0
    for n in range(1, 5):
        for i in range(len(toks) - n + 1):
            if " ".join(toks[i:i + n]) in phrases:
                cnt += 1
    return cnt


@given(st.lists(st.sampled_from(_WORDS + ["unrelated", "zzz"]),
                min_size=0, max_size=30),
       st.lists(st.sampled_from(
           ["spark", "dup", "alpha beta", "gamma delta spark"]),
           min_size=1, max_size=4, unique=True))
@settings(max_examples=200, deadline=None)
def test_dictmatch_matches_naive(tokens, phrases):
    text = " ".join(tokens)
    pd_ = PhraseDict(tuple(phrases))
    got = match_counts(pa.array([text, "", None]), pd_)
    assert got.tolist() == [_naive_match_count(text, set(phrases)), 0, 0]


@given(st.text(alphabet=st.sampled_from(
    list("abc XYZ.") + ["é", "ï", "ü", "’", "€"]),
    min_size=0, max_size=40))
@settings(max_examples=300, deadline=None)
def test_mojibake_roundtrip_recovers_original(s):
    """For any string whose UTF-8 bytes are cp1252-displayable, repairing
    the mojibake form recovers the original exactly."""
    try:
        moj = s.encode("utf-8").decode("cp1252")
    except UnicodeDecodeError:
        return  # bytes not cp1252-displayable -> no mojibake form exists
    out = fix_mojibake_array(pa.array([moj])).to_pylist()[0]
    assert out == s
