"""URL canonicalization, domain extraction and domain-level corpus policy
(blocklist + per-domain caps) — the web-crawl curation pass of a
training-data pipeline (CCNet/C4 keep at most k pages per domain and drop
blocklisted hosts before any expensive stage runs).

Canonicalization contract (ordered, each step one RE2 kernel, and the
DuckDB oracle composes the identical regexes in the identical order):

1. strip the ``#fragment``,
2. lowercase the ``scheme://authority`` prefix (path/query untouched),
3. drop ``utm_*`` tracking params (mid-query then trailing), tidy a
   dangling ``?``.

Domain = host of the canonical URL minus a leading ``www.`` (empty string
for non-URLs, matching DuckDB ``regexp_extract``'s no-match result).

Scale shape: tagging is stateless vectorized ``map_batches`` (pipelines
with the read); the blocklist is a tiny broadcast set applied as an Arrow
``is_in`` mask per batch (never a join); the per-domain cap reuses
``stages/stratified.py`` — deterministic md5-rank top-k with map-side
candidate pruning, ONE bucketed ``groupby(domain)`` exchange.
"""

from __future__ import annotations

from typing import Iterable

import pyarrow as pa
import pyarrow.compute as pc

_AUTHORITY_RE = r"^(?P<a>https?://[^/?#]*)"
_DOMAIN_RE = r"^https?://(?:www\.)?(?P<d>[^/:?#]+)"


def canonicalize_url_array(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    s = pc.cast(pc.fill_null(urls, ""), pa.large_string())
    s = pc.replace_substring_regex(s, r"#.*$", "")
    # lowercase prefix + strip prefix, exactly as the SQL mirror does — a
    # trailing `.*$` capture would fail to span embedded newlines in RE2
    # and silently skip the lowercasing on messy crawl URLs
    ext = pc.extract_regex(s, _AUTHORITY_RE)
    valid = pc.is_valid(ext)
    rest = pc.replace_substring_regex(s, _AUTHORITY_RE, "")
    lowered = pc.binary_join_element_wise(
        pc.utf8_lower(pc.cast(pc.struct_field(ext, "a"), pa.large_string())),
        rest,
        pa.scalar("", pa.large_string()),
    )
    s = pc.if_else(valid, lowered, s)
    s = pc.replace_substring_regex(s, r"utm_[a-z]+=[^&]*&", "")
    s = pc.replace_substring_regex(s, r"[?&]utm_[a-z]+=[^&]*$", "")
    return pc.replace_substring_regex(s, r"\?$", "")


def extract_domain_array(canon_urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(canon_urls, pa.ChunkedArray):
        canon_urls = canon_urls.combine_chunks()
    ext = pc.extract_regex(canon_urls, _DOMAIN_RE)
    return pc.if_else(
        pc.is_valid(ext),
        pc.cast(pc.struct_field(ext, "d"), pa.large_string()),
        pa.scalar("", pa.large_string()),
    )


class UrlTagger:
    """map_batches callable: appends ``canon_url`` and ``domain``."""

    def __init__(self, url_col: str = "url"):
        self.url_col = url_col

    def __call__(self, tbl: pa.Table) -> pa.Table:
        canon = canonicalize_url_array(tbl.column(self.url_col))
        return tbl.append_column("canon_url", canon).append_column(
            "domain", extract_domain_array(canon)
        )


def tag_urls(ds, *, url_col: str = "url"):
    return ds.map_batches(
        UrlTagger(url_col), batch_format="pyarrow", zero_copy_batch=True
    )


def domain_policy(
    ds,
    *,
    url_col: str = "url",
    id_col: str = "doc_id",
    blocklist: Iterable[str] = (),
    cap_k: int | None = None,
):
    """Blocklist filter + optional per-domain cap.  Returns a Dataset of
    (domain, id_col) for the surviving rows."""
    from great_expectations_ray.stages.stratified import stratified_sample

    tagged = tag_urls(ds, url_col=url_col)
    banned = frozenset(blocklist)
    if banned:
        banned_arr = pa.array(sorted(banned), pa.large_string())

        def drop_banned(tbl: pa.Table) -> pa.Table:
            keep = pc.invert(pc.is_in(tbl.column("domain"), value_set=banned_arr))
            return tbl.filter(keep)

        tagged = tagged.map_batches(
            drop_banned, batch_format="pyarrow", zero_copy_batch=True
        )
    if cap_k is None:
        return tagged.select_columns(["domain", id_col])
    return stratified_sample(tagged, strata_cols=["domain"], id_col=id_col, k=cap_k)
