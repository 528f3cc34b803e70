from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from great_expectations_ray.stages.urlops import (
    canonicalize_url_array,
    domain_policy,
    extract_domain_array,
    tag_urls,
)


def test_canonicalize_steps():
    out = canonicalize_url_array(pa.array([
        "https://WWW.Site.COM/Path/X?utm_source=a&id=1#frag",
        "https://a.com/p?utm_campaign=x",          # only param -> query gone
        "https://a.com/p?id=1&utm_medium=em",      # trailing utm param
        "https://a.com/p?utm_a=1&utm_b=2",         # every param tracking
        "not a url",
        None,
    ]))
    assert out.to_pylist() == [
        "https://www.site.com/Path/X?id=1",
        "https://a.com/p",
        "https://a.com/p?id=1",
        "https://a.com/p",
        "not a url",
        "",
    ]


def test_extract_domain():
    dom = extract_domain_array(pa.array([
        "https://www.site0.com/x", "http://sub.host.org/", "plain text",
    ]))
    assert dom.to_pylist() == ["site0.com", "sub.host.org", ""]


def test_path_case_preserved():
    out = canonicalize_url_array(pa.array(["https://A.COM/KeepCase?Q=V"]))
    assert out.to_pylist() == ["https://a.com/KeepCase?Q=V"]


def test_domain_policy_blocklist_and_cap(ray_session):
    rows = [(i, f"https://site{i % 3}.com/p/{i}") for i in range(30)]
    ds = rd.from_arrow(pa.table({
        "doc_id": [r[0] for r in rows],
        "url": [r[1] for r in rows],
    }))
    out = domain_policy(ds, blocklist=["site0.com"], cap_k=4).take_all()
    by_dom: dict[str, int] = {}
    for r in out:
        by_dom[r["domain"]] = by_dom.get(r["domain"], 0) + 1
    assert "site0.com" not in by_dom
    assert by_dom == {"site1.com": 4, "site2.com": 4}


def test_domain_policy_no_cap(ray_session):
    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2], "url": ["https://a.com/1", "https://b.com/2"],
    }))
    out = sorted(r["domain"] for r in domain_policy(ds).take_all())
    assert out == ["a.com", "b.com"]


def test_tag_urls_appends_columns(ray_session):
    ds = rd.from_arrow(pa.table({"url": ["https://WWW.X.com/a#f"]}))
    row = tag_urls(ds).take_all()[0]
    assert row["canon_url"] == "https://www.x.com/a"
    assert row["domain"] == "x.com"


def test_newline_in_url_still_lowercases_authority():
    out = canonicalize_url_array(pa.array(["https://A.COM/x\ny"]))
    assert out.to_pylist() == ["https://a.com/x\ny"]
