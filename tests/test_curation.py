"""End-to-end curation pipeline (pipelines/curation.py)."""

import json

import pandas as pd
import pyarrow.parquet as pq
import ray  # noqa: F401  (session fixture)

from great_expectations_ray.pipelines.curation import (
    CurationConfig,
    curate_corpus,
)


def _write_corpus(path: str) -> None:
    rows = []
    for i in range(40):
        # per-doc-unique filler so unrelated docs share no shingles
        body = " ".join(f"tok{i}word{j}piece{(i * 31 + j) % 97}"
                        for j in range(30))
        rows.append({"doc_id": i, "text": f"doc {i} begins {body} ends {i}"})
    # exact duplicates of doc 0's text
    for i in range(40, 44):
        rows.append({"doc_id": i, "text": rows[0]["text"]})
    # near-duplicates of doc 1 (one word changed; identical to each other)
    for i in range(44, 47):
        rows.append({"doc_id": i,
                     "text": rows[1]["text"].replace("begins", "starts")})
    # highly repetitive doc (fails the Gopher gate)
    rows.append({"doc_id": 47, "text": "spam ham eggs " * 40})
    # mojibake doc (must survive, repaired)
    rows.append({"doc_id": 48,
                 "text": "cafÃ© doc: " + " ".join(
                     f"moj{j}unique{j * 7}" for j in range(25)) + " end"})
    # too-short doc (fails C4 min_words_per_line)
    rows.append({"doc_id": 49, "text": "tiny"})
    pd.DataFrame(rows).to_parquet(path)


def test_curate_corpus_funnel(ray_session, tmp_path):
    src = str(tmp_path / "corpus.parquet")
    out = str(tmp_path / "curated")
    _write_corpus(src)

    report = curate_corpus(src, out, CurationConfig(
        min_words_per_line=3,
        max_dup5_char_frac=0.5,
        # signature-Jaccard verification: without it one unrelated doc in
        # this corpus rides an LSH band collision into the drop set
        minhash_threshold=0.5,
        keep_frac=0.8,
        partitions=2,
    ))
    assert report["rows_in"] == 50
    # C4 drops the 4-word doc ("tiny" -> <3 words)
    assert report["after_c4"] == 49
    # repetition gate removed the spam doc (-1), exact dedup removes the 4
    # verbatim copies of doc 0 AND 2 of the 3 identical near-variants
    assert report["after_exact_dedup"] == 42
    # minhash removes the surviving near-copy of doc 1
    assert report["after_neardup"] == 41
    # final selection keeps ceil(0.8 * 41)
    assert report["rows_out"] == 33

    kept = pq.read_table(out).to_pandas()
    assert len(kept) == 33
    assert 0 in kept["doc_id"].values          # keeper of the exact dups
    assert 1 in kept["doc_id"].values          # keeper of the near dups
    assert not set(range(40, 47)) & set(kept["doc_id"])  # dups gone
    assert 47 not in kept["doc_id"].values     # repetitive doc gone
    # mojibake doc survived, repaired
    moj = kept.loc[kept["doc_id"] == 48, "text"]
    assert len(moj) == 1 and moj.iloc[0].startswith("café doc:")

    with open(out + ".report.json") as f:
        assert json.load(f) == report
