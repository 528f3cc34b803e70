from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from great_expectations_ray.stages.toxicity import (
    DEFAULT_BADWORDS,
    badword_pattern,
    score_toxicity,
    toxicity_scrub_rules,
)


def test_score_and_mask(ray_session):
    ds = rd.from_arrow(pa.table({"content": [
        "you damn idiot go away",        # 2 / 5
        "clean text here",               # 0 / 3
        "hellish is not hell itself",    # boundary: only the bare word
        "",
    ]}))
    rows = sorted(
        score_toxicity(ds, mask=True, threshold=0.2).take_all(),
        key=lambda r: r["content"],
    )
    by = {r["content"]: r for r in rows}
    r0 = by["you damn idiot go away"]
    assert (r0["tox_matches"], r0["word_cnt"], r0["toxic"]) == (2, 5, True)
    assert r0["tox_score"] == 2 / 5
    assert r0["masked"] == "you **** **** go away"
    r1 = by["hellish is not hell itself"]
    assert r1["tox_matches"] == 1 and r1["masked"] == "hellish is not **** itself"
    assert by[""]["tox_score"] == 0.0 and not by[""]["toxic"]


def test_case_insensitive():
    import pyarrow.compute as pc

    n = pc.count_substring_regex(
        pa.array(["DAMN Damn damn"]), badword_pattern()
    )
    assert n.to_pylist() == [3]


def test_scrub_rules_shape_plugs_into_pipeline():
    rules = toxicity_scrub_rules()
    assert len(rules) == 1
    name, pat, repl = rules[0]
    assert name == "toxicity" and repl == "****"
    for w in DEFAULT_BADWORDS:
        assert w in pat


def test_fused_with_pii_rules(ray_session):
    """Toxicity masking composes with the PII rules in the one fused
    scrub pass (north-star 'PII/toxicity scrub')."""
    from great_expectations_ray.pipelines.quality_filter import RuleEvalScrub
    from great_expectations_ray.stages.scrub import DEFAULT_SCRUB_RULES
    from great_expectations_ray.core.suite import ExpectationSuite

    suite = ExpectationSuite("s").add(
        "expect_column_value_lengths_to_be_between", column="content", min_value=1)
    stage = RuleEvalScrub(
        suite.resolved_expectations(),
        list(DEFAULT_SCRUB_RULES) + toxicity_scrub_rules(),
    )
    ds = rd.from_arrow(pa.table({
        "content": ["write to a@b.com you idiot"],
    }))
    out = ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True).take_all()
    assert out[0]["content"] == "write to <EMAIL> you ****"


def test_metacharacter_words_are_escaped():
    import pyarrow.compute as pc

    pat = badword_pattern(("f*ck",))
    hits = pc.count_substring_regex(
        pa.array(["f*ck this", "fck fine", "ck ok", "ffck nope"]), pat)
    assert hits.to_pylist() == [1, 0, 0, 0]
