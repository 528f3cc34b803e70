from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from great_expectations_ray.stages.normalize import (
    NormalizeConfig,
    normalize_array,
    normalize_text,
)


def test_full_pipeline_steps():
    out = normalize_array(pa.array([
        "  “Hello”\x00 –\tworld…  ",
        "plain text",
        None,
    ]), NormalizeConfig(lowercase=True))
    assert out[0].as_py() == '"hello" - world...'
    assert out[1].as_py() == "plain text"
    assert out[2].as_py() is None


def test_nfc_composes_combining_chars():
    # e + COMBINING ACUTE (NFD) -> é (NFC)
    out = normalize_array(pa.array(["café"]))
    assert out[0].as_py() == "café"


def test_config_toggles():
    keep_case = normalize_array(pa.array(["A  B"]), NormalizeConfig(lowercase=False))
    assert keep_case[0].as_py() == "A B"
    no_collapse = normalize_array(
        pa.array(["A  B "]), NormalizeConfig(collapse_whitespace=False))
    assert no_collapse[0].as_py() == "A  B "
    keep_quotes = normalize_array(
        pa.array(["“x”"]), NormalizeConfig(straighten_quotes=False))
    assert keep_quotes[0].as_py() == "“x”"


def test_dataset_changed_flag():
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["clean text", "dirty\ttext"]),
    }))
    out = normalize_text(ds).to_pandas().sort_values("doc_id")
    assert list(out["changed"]) == [False, True]
    assert out["norm_text"].tolist() == ["clean text", "dirty text"]
