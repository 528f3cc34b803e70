"""Code-clone detection (stages/code_clone.py) — normalization semantics,
keep-first marking, differential vs a naive per-doc reimplementation."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pytest
import ray

from great_expectations_ray.stages.code_clone import (
    mark_code_clones,
    normalize_code,
)


def _naive_norm(doc: str, level: int) -> str:
    s = doc or ""
    s = re.sub(r"/\*[\s\S]*?\*/", "", s)
    s = re.sub(r"(?m)(//|#|--).*$", "", s)
    if level == 2:
        s = re.sub(r"\"[^\"\n]*\"|'[^'\n]*'", "<S>", s)
        s = re.sub(r"\b[0-9]+(\.[0-9]+)?\b", "<N>", s)
    return re.sub(r"[ \t\r\n\f\v]+", " ", s).strip(" ")


DOCS = [
    "int x = 1; // answer\nreturn x;",
    "int   x = 1;\n/* reformatted\n   copy */\nreturn x;",     # T1 clone of 0
    "int x = 2; # other literal\nreturn x;",                   # T2 clone of 0
    's = "alpha" + 7',
    "s = 'beta' + 9.5",                                        # T2 clone of 3
    "completely different body()",
    "",
    None,
]


def test_normalize_matches_naive_both_levels():
    for level in (1, 2):
        got = normalize_code(pa.array(DOCS, pa.string()), level=level).to_pylist()
        assert got == [_naive_norm(d, level) for d in DOCS]


def test_mark_code_clones_levels():
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(DOCS))),
        "content": pa.array(DOCS, pa.string()),
    })).repartition(3)
    t1 = mark_code_clones(ds, level=1).to_pandas().sort_values("doc_id")
    t2 = mark_code_clones(ds, level=2).to_pandas().sort_values("doc_id")
    # Type-1: only the whitespace/comment copy collapses; empty & null tie
    assert t1["is_clone"].tolist() == [0, 1, 0, 0, 0, 0, 0, 1]
    # Type-2 additionally collapses the literal variants
    assert t2["is_clone"].tolist() == [0, 1, 1, 0, 1, 0, 0, 1]
    # keeper is the smallest doc_id of each group
    g = t1[t1["clone_key"] == t1.loc[t1["doc_id"] == 1, "clone_key"].iloc[0]]
    assert g.loc[g["is_clone"] == 0, "doc_id"].iloc[0] == 0


def test_mark_code_clones_naive_differential():
    rng = np.random.default_rng(23)
    base = [f"fn f{i}() {{ return {i}; }} // c{i}" for i in range(200)]
    # clone half the corpus with whitespace/comment edits
    docs = base + [b.replace(" ", "  ").replace("// c", "# k") for b in base[:100]]
    ids = list(range(len(docs)))
    ds = ray.data.from_arrow(pa.table({
        "doc_id": ids, "content": pa.array(docs, pa.string())})).repartition(5)
    out = mark_code_clones(ds, level=1).to_pandas().sort_values("doc_id")
    norm = [_naive_norm(d, 1) for d in docs]
    first_of = {}
    want = []
    for i, nkey in zip(ids, norm):
        want.append(0 if first_of.setdefault(nkey, i) == i else 1)
    assert out["is_clone"].tolist() == want
    assert out["is_clone"].sum() == 100


def test_level_validation():
    with pytest.raises(ValueError):
        normalize_code(pa.array(["x"]), level=3)


def test_dedup_cli_clone_method(tmp_path, capsys):
    import json

    import pyarrow.parquet as pq

    from great_expectations_ray.__main__ import main

    docs = DOCS[:6] * 1  # includes one T1 clone and two extra T2 clones
    src = str(tmp_path / "code.parquet")
    pq.write_table(pa.table({
        "doc_id": list(range(len(docs))),
        "text": pa.array(docs, pa.string())}), src)

    out1 = str(tmp_path / "c1")
    assert main(["dedup", "--input", src, "--output", out1,
                 "--method", "clone1", "--partitions", "2"]) == 0
    s1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s1["rows_dropped"] == 1 and s1["rows_out"] == 5

    out2 = str(tmp_path / "c2")
    assert main(["dedup", "--input", src, "--output", out2,
                 "--method", "clone2", "--partitions", "2"]) == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2["rows_dropped"] == 3 and s2["rows_out"] == 3
    kept = pq.read_table(out2).to_pandas()
    assert set(kept["doc_id"]) == {0, 3, 5}     # smallest id per clone group
    assert list(kept.columns) == ["doc_id", "text"]
