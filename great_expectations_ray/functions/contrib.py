"""Ports of high-value contrib expectations through the PUBLIC extension
surface (``register_condition``) — the proof that the registry carries
community expectations, per reference
``contrib/experimental/great_expectations_experimental/expectations/``.

Each port reimplements the contrib expectation's observable semantics
(regex text, edge-case behavior) as a vectorized Arrow kernel — none of the
contrib execution code is copied.  Cited next to each kernel:

- expect_column_values_to_be_hexadecimal.py:10 (regex)
- expect_column_values_to_be_valid_arn.py:11 (regex)
- expect_column_values_to_be_valid_scientific_notation.py:11 (regex)
- expect_column_values_not_to_be_future_date.py:23-33 (parse; unparseable
  values are unexpected; "today" is not future)
- expect_column_values_number_of_decimal_places_to_equal.py:27-36 (string
  conversion; integers count as having the expected places)
- expect_column_values_to_not_contain_special_characters.py:45-63
  (string.punctuation minus allowed_characters)
"""

from __future__ import annotations

import string

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from great_expectations_ray.functions.column_map import (
    KernelResult,
    _bool_np,
    _nonnull_domain,
    register_condition,
)

# regex constants match the contrib definitions verbatim (they ARE the
# expectation's contract)
HEXADECIMAL_REGEX = r"^[0-9a-fA-F]+$"
ARN_REGEX = r"^arn:([^:\n]*):([^:\n]*):([^:\n]*):([^:\n]*):(([^:\/\n]*)[:\/])?(.*)$"
SCIENTIFIC_NOTATION_REGEX = (
    r"^[+\-]?(?=\.\d|\d)(?:0|[1-9]\d*)?(?:\.\d+)?(?:(?<=\d)(?:[eE][+\-]?\d+))?$"
)


def _regex_kernel(regex: str):
    """Vectorized RE2 kernel; patterns RE2 rejects (lookaround, e.g. the
    scientific-notation contrib regex) fall back to compiled Python ``re``
    over the batch with a by-value cache."""
    import re as _re

    try:
        # non-empty probe: RE2 compiles lazily, an empty array never trips it
        pc.match_substring_regex(pa.array(["x"], pa.large_string()), regex)
        use_re2 = True
    except pa.lib.ArrowInvalid:
        use_re2 = False
        compiled = _re.compile(regex)

    def kernel(tbl: pa.Table, kwargs: dict) -> KernelResult:
        col, valid, nulls = _nonnull_domain(tbl, kwargs)
        s = pc.cast(col, pa.large_string())
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        if use_re2:
            meets = _bool_np(pc.match_substring_regex(s, regex))
        else:
            cache: dict[str, bool] = {}

            def ok(v) -> bool:
                if v is None:
                    return False
                hit = cache.get(v)
                if hit is None:
                    hit = compiled.search(v) is not None
                    cache[v] = hit
                return hit

            meets = np.fromiter(
                (ok(v) for v in s.to_pylist()), dtype=bool, count=len(s)
            )
        return KernelResult(meets, valid, s, nulls)

    return kernel


register_condition("expect_column_values_to_be_hexadecimal")(
    _regex_kernel(HEXADECIMAL_REGEX)
)
register_condition("expect_column_values_to_be_valid_arn")(
    _regex_kernel(ARN_REGEX)
)
register_condition("expect_column_values_to_be_valid_scientific_notation")(
    _regex_kernel(SCIENTIFIC_NOTATION_REGEX)
)


@register_condition("expect_column_values_to_not_be_future_date")
def _not_future_date(tbl: pa.Table, kwargs: dict) -> KernelResult:
    """Strings parse with dateutil; a value strictly after today is
    unexpected; an unparseable value is unexpected (contrib returns False
    on parse failure); today itself passes.  Timestamp/date columns
    compare natively — no per-row parse."""
    from datetime import date, datetime

    col, valid, nulls = _nonnull_domain(tbl, kwargs)
    today = date.today()
    if pa.types.is_timestamp(col.type) or pa.types.is_date(col.type):
        bound = pa.scalar(
            datetime(today.year, today.month, today.day, 23, 59, 59, 999999)
            if pa.types.is_timestamp(col.type)
            else today
        )
        meets = _bool_np(pc.less_equal(col, bound))
        vals = pc.cast(col, pa.large_string()).combine_chunks()
        return KernelResult(meets, valid, vals, nulls)
    # string column: dateutil parse per distinct value (cache-by-value keeps
    # the per-row python cost bounded by the distinct count)
    from dateutil import parser as _p

    s = pc.cast(col, pa.large_string()).combine_chunks()
    cache: dict[str, bool] = {}

    def ok(v) -> bool:
        if v is None:
            return False
        hit = cache.get(v)
        if hit is None:
            try:
                hit = _p.parse(v).date() <= today
            except Exception:
                hit = False
            cache[v] = hit
        return hit

    meets = np.fromiter((ok(v) for v in s.to_pylist()), dtype=bool, count=len(s))
    return KernelResult(meets, valid, s, nulls)


@register_condition("expect_column_values_number_of_decimal_places_to_equal")
def _decimal_places_equal(tbl: pa.Table, kwargs: dict) -> KernelResult:
    """Decimal places via string conversion; integral values count as having
    the expected number of places (contrib's `x == int(x)` special case)."""
    places = int(kwargs["decimal_places"])
    col, valid, nulls = _nonnull_domain(tbl, kwargs)
    s = pc.cast(col, pa.large_string()).combine_chunks()
    # digits after the '.', 0 when there is no '.'
    dot = pc.find_substring(s, ".")
    total = pc.utf8_length(s)
    after = pc.if_else(
        pc.equal(dot, -1),
        pa.scalar(0, pa.int32()),
        pc.cast(pc.subtract(pc.subtract(total, dot), 1), pa.int32()),
    )
    meets = _bool_np(pc.equal(after, places))
    if pa.types.is_floating(col.type) or pa.types.is_integer(col.type):
        # integral values (including 3.0 -> "3.0", 1 decimal) pass by fiat
        c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        integral = _bool_np(pc.equal(c, pc.floor(pc.cast(c, pa.float64()))))
        meets = meets | integral
    return KernelResult(meets, valid, s, nulls)


@register_condition("expect_column_values_to_not_contain_special_characters")
def _not_contain_special(tbl: pa.Table, kwargs: dict) -> KernelResult:
    """Unexpected iff the value contains any of string.punctuation minus
    ``allowed_characters``."""
    import re

    allowed = set(kwargs.get("allowed_characters") or [])
    specials = [c for c in string.punctuation if c not in allowed]
    col, valid, nulls = _nonnull_domain(tbl, kwargs)
    s = pc.cast(col, pa.large_string())
    if not specials:
        arr = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        return KernelResult(np.ones(len(col), dtype=bool), valid, arr, nulls)
    pat = "[" + re.escape("".join(specials)) + "]"
    meets = ~_bool_np(pc.match_substring_regex(s, pat))
    arr = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
    return KernelResult(meets, valid, arr, nulls)


@register_condition("expect_foreign_keys_in_column_a_to_exist_in_column_b")
def _foreign_keys_exist(tbl: pa.Table, kwargs: dict) -> KernelResult:
    """Referential check: every value of ``column`` must appear in
    ``column_B`` of the provided rows
    (expect_foreign_keys_in_column_a_to_exist_in_column_b.py:24-28 —
    ``df`` is a list of dicts / records; the contrib marks this a stopgap
    until cross-table templates exist).  The key set rides the expectation
    config (broadcast once with the compiled suite); for a LARGE dimension
    use functions/joins.broadcast_semi_anti or hash_bucket_join instead."""
    rows = kwargs["df"]
    col_b = kwargs["column_B"]
    if isinstance(rows, dict):  # columnar {col: [values]}
        values = rows[col_b]
    else:  # records [{col: v}, ...]
        values = [r[col_b] for r in rows]
    col, valid, nulls = _nonnull_domain(tbl, kwargs)
    vs = pa.array(sorted({v for v in values if v is not None}, key=str))
    meets = _bool_np(pc.is_in(col, value_set=vs))
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return KernelResult(meets, valid, arr, nulls)


@register_condition("expect_multicolumn_values_to_not_be_all_null")
def _not_all_null(tbl: pa.Table, kwargs: dict) -> KernelResult:
    """Row passes iff ANY of ``column_list`` is non-null
    (expect_multicolumn_values_not_to_be_all_null.py:36-37).  Whole-column
    domain: null rows are exactly what is being judged."""
    cols = kwargs["column_list"]
    meets = np.zeros(tbl.num_rows, dtype=bool)
    for c in cols:
        meets |= _bool_np(pc.is_valid(tbl.column(c)))
    first = pc.cast(tbl.column(cols[0]), pa.large_string())
    if isinstance(first, pa.ChunkedArray):
        first = first.combine_chunks()
    return KernelResult(
        meets, np.ones(tbl.num_rows, dtype=bool), first, 0
    )


@register_condition("expect_column_values_to_not_contain_character")
def _not_contain_character(tbl: pa.Table, kwargs: dict) -> KernelResult:
    """Unexpected iff str(value) contains ``character``
    (expect_column_values_to_not_contain_character.py:28-29)."""
    ch = str(kwargs["character"])
    col, valid, nulls = _nonnull_domain(tbl, kwargs)
    s = pc.cast(col, pa.large_string())
    meets = ~_bool_np(pc.match_substring(s, ch))
    arr = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
    return KernelResult(meets, valid, arr, nulls)
