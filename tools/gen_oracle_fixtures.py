"""Generate DuckDB-oracle fixture parquet for the six model/LSH catalog
queries (langid, perplexity, minhash, simhash, embedding near-dup, LSH ANN).

These stages are seeded and deterministic, so their expected outputs are
computable ahead of time.  This script recomputes them with an INDEPENDENT
implementation — plain pandas/numpy/re, per-document loops, no Ray, none of
the ``great_expectations_ray.stages`` execution code — sharing only the
published spec constants (feature tables, seeds, hash bases) that define the
operators.  The outputs land in ``fixtures/<query>.parquet`` keyed by a
content fingerprint of the input table, and ``oracle_sql()`` SELECTs the
matching rows:

    SELECT doc_id, lang_pred FROM read_parquet('fixtures/langid_docs.parquet')
    WHERE fp = (SELECT CAST(SUM(doc_id * n_chars) AS BIGINT) FROM documents)

Run:  python tools/gen_oracle_fixtures.py  [sf_dir ...]
(defaults to /root/testdata/sf0.001 sf0.01 sf0.1)
"""

from __future__ import annotations

import math
import os
import re
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# spec constants only (shared operator definitions, not execution code)
from great_expectations_ray.stages.langid import LANG_FEATURES, UNKNOWN_LANG  # noqa: E402

M64 = (1 << 64) - 1
FNV_B = 1099511628211  # shared polynomial base (spec constant)
MERSENNE = (1 << 61) - 1

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "fixtures")


# --------------------------------------------------------------------------- #
# langid — per-doc python `re` evaluation of the folded feature spec
# --------------------------------------------------------------------------- #


def langid_fixture(docs: pd.DataFrame) -> pd.DataFrame:
    langs = list(LANG_FEATURES)
    spec = []
    for li, lang in enumerate(langs):
        hi = [p for p, w in LANG_FEATURES[lang] if w >= 2.0]
        lo = [p for p, w in LANG_FEATURES[lang] if w < 2.0]
        for group, w in ((hi, 2.5), (lo, 1.2)):
            if not group:
                continue
            pat = "(?:" + "|".join(group) + ")"
            flags = re.MULTILINE if "(?m)" in pat else 0
            spec.append((li, re.compile(pat.replace("(?m)", ""), flags), w))
    preds = []
    for text in docs["text"]:
        t = (text or "")[:2048]
        scores = np.zeros(len(langs))
        for li, rx, w in spec:
            cnt = sum(1 for _ in rx.finditer(t))
            scores[li] += w * min(float(cnt), 25.0)
        scores /= np.log2(max(float(len(t)), 2.0))
        best = int(scores.argmax())
        preds.append(langs[best] if scores[best] > 0.05 else UNKNOWN_LANG)
    return pd.DataFrame({"doc_id": docs["doc_id"].to_numpy(), "lang_pred": preds})


# --------------------------------------------------------------------------- #
# perplexity — per-doc python trigram counting + numpy table formula
# --------------------------------------------------------------------------- #

N_CTX = 8192
CTX_MULT = 9973


def _bucket(c1: int, c2: int) -> int:
    raw = (c1 << 8) | c2
    return ((raw * CTX_MULT) ^ (raw >> 7)) % N_CTX


def perplexity_fixture(docs: pd.DataFrame, sample_rows: int = 200) -> pd.DataFrame:
    # model: first `sample_rows` rows in file order, truthy texts only,
    # trigram counts accumulated with a plain python dict
    from collections import Counter

    counts = Counter()
    for text in docs["text"].head(sample_rows):
        if not text:
            continue
        b = text.encode("utf-8", "replace")
        for i in range(len(b) - 2):
            counts[(_bucket(b[i], b[i + 1]), b[i + 2])] += 1
    mat = np.zeros((N_CTX, 256), dtype=np.float64)
    for (ctx, nxt), c in counts.items():
        mat[ctx, nxt] = c
    sm = mat + 0.1
    table = np.log2(sm / sm.sum(axis=1, keepdims=True)).astype(np.float16)

    out = []
    for text in docs["text"]:
        b = (text or "").encode("utf-8", "replace")[:65536]
        if len(b) == 0:
            out.append(1e9)
            continue
        if len(b) < 3:
            out.append(256.0)
            continue
        lp = 0.0
        for i in range(len(b) - 2):
            lp += float(table[_bucket(b[i], b[i + 1]), b[i + 2]])
        h = -(lp / (len(b) - 2))
        out.append(round(float(2.0 ** h), 6))
    return pd.DataFrame({"doc_id": docs["doc_id"].to_numpy(), "perplexity": out})


def lm_trained_fixture(docs: pd.DataFrame) -> pd.DataFrame:
    # full-corpus-trained LM (the distributed-training query): same model
    # family as perplexity_fixture but counts accumulate over EVERY row
    from collections import Counter

    counts = Counter()
    for text in docs["text"]:
        if not text:
            continue
        b = text.encode("utf-8", "replace")
        for i in range(len(b) - 2):
            counts[(_bucket(b[i], b[i + 1]), b[i + 2])] += 1
    mat = np.zeros((N_CTX, 256), dtype=np.float64)
    for (ctx, nxt), c in counts.items():
        mat[ctx, nxt] = c
    sm = mat + 0.1
    table = np.log2(sm / sm.sum(axis=1, keepdims=True)).astype(np.float16)

    out = []
    for text in docs["text"]:
        b = (text or "").encode("utf-8", "replace")[:65536]
        if len(b) == 0:
            out.append(1e9)
            continue
        if len(b) < 3:
            out.append(256.0)
            continue
        lp = 0.0
        for i in range(len(b) - 2):
            lp += float(table[_bucket(b[i], b[i + 1]), b[i + 2]])
        h = -(lp / (len(b) - 2))
        out.append(round(float(2.0 ** h), 6))
    return pd.DataFrame({"doc_id": docs["doc_id"].to_numpy(), "perplexity": out})


# --------------------------------------------------------------------------- #
# minhash — per-doc window hashing, global python-dict LSH grouping
# --------------------------------------------------------------------------- #


def minhash_fixture(docs: pd.DataFrame, num_perm=128, bands=16, k=8, seed=17) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=num_perm, dtype=np.uint64) | np.uint64(1)
    bvec = rng.integers(0, MERSENNE, size=num_perm, dtype=np.uint64)
    r = num_perm // bands
    B = np.uint64(FNV_B)

    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        by = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
        nw = len(by) - k + 1
        if nw <= 0:
            sig = np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        else:
            h = np.zeros(nw, dtype=np.uint64)
            for j in range(k):
                h = h * B + by[j : nw + j].astype(np.uint64)
            sig = (h[:, None] * a[None, :] + bvec[None, :]).min(axis=0)
        for bi in range(bands):
            bk = 0
            for j in range(bi * r, (bi + 1) * r):
                bk = (bk * FNV_B + int(sig[j])) & M64
            buckets.setdefault((bi, bk), []).append(int(doc_id))

    dup = {int(d): False for d in docs["doc_id"]}
    for members in buckets.values():
        lo = min(members)
        for m in members:
            if m != lo:
                dup[m] = True
    ids = sorted(dup)
    return pd.DataFrame({"doc_id": ids, "is_neardup": [dup[i] for i in ids]})


def substr_remove_fixture(docs: pd.DataFrame, window: int = 40) -> pd.DataFrame:
    """ExactSubstr keep-first span removal over the derived substr corpus
    (same %10 suffix spec as the detection query): windows at every byte
    position; for each window shared by >= 2 distinct docs the smallest
    (doc_id, pos) occurrence is kept, every other occurrence marks
    [pos, pos+window) for deletion; per-doc marks merge into maximal ranges
    and are cut from the utf-8 bytes.  Plain python dicts throughout."""
    import hashlib

    texts: dict[int, bytes] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        d = int(doc_id)
        r10 = d % 10
        suf = (" COMMON LICENSE HEADER BLOCK COPIED VERBATIM ACROSS FILES"
               if r10 < 2 else
               " ANOTHER SHARED DISCLAIMER PARAGRAPH REPEATED IN SOME FILES TOO"
               if r10 == 5 else "")
        texts[d] = ((text or "") + suf).encode("utf-8")

    occ: dict[bytes, list[tuple[int, int]]] = {}
    for d, b in texts.items():
        for p in range(len(b) - window + 1):
            occ.setdefault(b[p:p + window], []).append((d, p))

    marks: dict[int, list[tuple[int, int]]] = {}
    for lst in occ.values():
        if len({d for d, _ in lst}) < 2:
            continue
        lst = sorted(lst)
        for d, p in lst[1:]:
            marks.setdefault(d, []).append((p, p + window))

    rows = []
    for d in sorted(texts):
        b = texts[d]
        ranges = []
        for s, e in sorted(marks.get(d, [])):
            if ranges and s <= ranges[-1][1]:
                if e > ranges[-1][1]:
                    ranges[-1] = (ranges[-1][0], e)
            else:
                ranges.append((s, e))
        pieces, last = [], 0
        for s, e in ranges:
            pieces.append(b[last:s])
            last = e
        pieces.append(b[last:])
        clean = b"".join(pieces).decode("utf-8", "replace")
        rows.append({
            "doc_id": d,
            "removed_bytes": sum(e - s for s, e in ranges),
            "n_cuts": len(ranges),
            "clean_md5": hashlib.md5(clean.encode("utf-8")).hexdigest(),
        })
    return pd.DataFrame(rows)


def zlib_ratio_fixture(docs: pd.DataFrame, level: int = 6) -> pd.DataFrame:
    """Compression-ratio signal: per-doc zlib level-6 compressed length /
    raw utf-8 length (0.0 for empty docs).  Pure per-doc stdlib zlib — the
    level is the shared spec constant."""
    import zlib

    ids, ratios = [], []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        b = (text or "").encode("utf-8")
        ids.append(int(doc_id))
        ratios.append(len(zlib.compress(b, level)) / len(b) if b else 0.0)
    order = np.argsort(ids)
    return pd.DataFrame({"doc_id": np.asarray(ids)[order],
                         "ratio": np.asarray(ratios)[order]})


def incremental_neardup_fixture(docs: pd.DataFrame, num_perm=128, bands=16,
                                k=8, seed=17) -> pd.DataFrame:
    """Incremental near-dup vs snapshot: docs with doc_id % 3 == 0 are the
    snapshot; every other doc is_known iff it shares any (band, band-key)
    with a snapshot doc.  Same per-doc signature construction as
    minhash_fixture; snapshot membership via a plain python set."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=num_perm, dtype=np.uint64) | np.uint64(1)
    bvec = rng.integers(0, MERSENNE, size=num_perm, dtype=np.uint64)
    r = num_perm // bands
    B = np.uint64(FNV_B)

    def doc_band_keys(text: str) -> list[tuple[int, int]]:
        by = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
        nw = len(by) - k + 1
        if nw <= 0:
            sig = np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        else:
            h = np.zeros(nw, dtype=np.uint64)
            for j in range(k):
                h = h * B + by[j : nw + j].astype(np.uint64)
            sig = (h[:, None] * a[None, :] + bvec[None, :]).min(axis=0)
        keys = []
        for bi in range(bands):
            bk = 0
            for j in range(bi * r, (bi + 1) * r):
                bk = (bk * FNV_B + int(sig[j])) & M64
            keys.append((bi, bk))
        return keys

    snap_keys: set[tuple[int, int]] = set()
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        if int(doc_id) % 3 == 0:
            snap_keys.update(doc_band_keys(text))

    ids, known = [], []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        if int(doc_id) % 3 == 0:
            continue
        ids.append(int(doc_id))
        known.append(any(kk in snap_keys for kk in doc_band_keys(text)))
    order = np.argsort(ids)
    return pd.DataFrame({"doc_id": np.asarray(ids)[order],
                         "is_known": np.asarray(known)[order]})


def cc_cluster_fixture(docs: pd.DataFrame, num_perm=128, bands=16, k=8, seed=17) -> pd.DataFrame:
    """Transitive near-dup clusters: same LSH bucket construction as
    minhash_fixture, then plain union-find over each bucket's member list
    (cluster id = min doc id of the connected component).  Independent of the
    stage's distributed label-propagation code path."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=num_perm, dtype=np.uint64) | np.uint64(1)
    bvec = rng.integers(0, MERSENNE, size=num_perm, dtype=np.uint64)
    r = num_perm // bands
    B = np.uint64(FNV_B)

    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        by = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
        nw = len(by) - k + 1
        if nw <= 0:
            sig = np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        else:
            h = np.zeros(nw, dtype=np.uint64)
            for j in range(k):
                h = h * B + by[j : nw + j].astype(np.uint64)
            sig = (h[:, None] * a[None, :] + bvec[None, :]).min(axis=0)
        for bi in range(bands):
            bk = 0
            for j in range(bi * r, (bi + 1) * r):
                bk = (bk * FNV_B + int(sig[j])) & M64
            buckets.setdefault((bi, bk), []).append(int(doc_id))

    parent = {int(d): int(d) for d in docs["doc_id"]}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for members in buckets.values():
        lo = find(min(members))
        for m in members:
            rm = find(m)
            if rm != lo:
                hi, lo = max(rm, lo), min(rm, lo)
                parent[hi] = lo
    ids = sorted(parent)
    return pd.DataFrame({"doc_id": ids, "cluster": [find(i) for i in ids]})


def _doc_shingle_hashes(text: str, k: int = 8) -> np.ndarray:
    """Per-doc window hashes, same polynomial spec as the stage."""
    by = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
    nw = len(by) - k + 1
    if nw <= 0:
        return np.empty(0, dtype=np.uint64)
    h = np.zeros(nw, dtype=np.uint64)
    B = np.uint64(FNV_B)
    for j in range(k):
        h = h * B + by[j : nw + j].astype(np.uint64)
    return h


def minhash_verified_fixture(docs: pd.DataFrame, num_perm=128, bands=16, k=8,
                             seed=17, threshold=0.5) -> pd.DataFrame:
    """Jaccard-verified variant: a doc is near-dup iff in SOME band bucket a
    LOWER-id member's signature agrees on >= threshold of the permutations."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=num_perm, dtype=np.uint64) | np.uint64(1)
    bvec = rng.integers(0, MERSENNE, size=num_perm, dtype=np.uint64)
    r = num_perm // bands

    sigs: dict[int, np.ndarray] = {}
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        h = _doc_shingle_hashes(text, k)
        if len(h) == 0:
            sig = np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        else:
            sig = (h[:, None] * a[None, :] + bvec[None, :]).min(axis=0)
        sigs[int(doc_id)] = sig
        for bi in range(bands):
            bk = 0
            for j in range(bi * r, (bi + 1) * r):
                bk = (bk * FNV_B + int(sig[j])) & M64
            buckets.setdefault((bi, bk), []).append(int(doc_id))

    dup = {int(d): False for d in docs["doc_id"]}
    for members in buckets.values():
        members = sorted(members)
        for i in range(1, len(members)):
            best = max(
                float((sigs[members[i]] == sigs[members[j]]).mean())
                for j in range(i)
            )
            if best >= threshold:
                dup[members[i]] = True
    ids = sorted(dup)
    return pd.DataFrame({"doc_id": ids, "is_neardup": [dup[i] for i in ids]})


def ngram_jaccard_fixture(docs: pd.DataFrame, num_perm=128, bands=16, k=8,
                          seed=17, threshold=0.5) -> pd.DataFrame:
    """Exact-Jaccard star-verified variant: a doc is near-dup iff in SOME
    band bucket the EXACT k-gram Jaccard (python sets of shingle hashes)
    between the doc and the bucket's MINIMUM-id member >= threshold.
    J(empty, empty) = 1.0, J(empty, nonempty) = 0.0.  Independent of the
    stage's routed-exchange execution path."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=num_perm, dtype=np.uint64) | np.uint64(1)
    bvec = rng.integers(0, MERSENNE, size=num_perm, dtype=np.uint64)
    r = num_perm // bands

    shing: dict[int, set] = {}
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        h = _doc_shingle_hashes(text, k)
        shing[int(doc_id)] = set(h.tolist())
        if len(h) == 0:
            sig = np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        else:
            sig = (h[:, None] * a[None, :] + bvec[None, :]).min(axis=0)
        for bi in range(bands):
            bk = 0
            for j in range(bi * r, (bi + 1) * r):
                bk = (bk * FNV_B + int(sig[j])) & M64
            buckets.setdefault((bi, bk), []).append(int(doc_id))

    dup = {int(d): False for d in docs["doc_id"]}
    for members in buckets.values():
        lo = min(members)
        slo = shing[lo]
        for m in members:
            if m == lo or dup[m]:
                continue
            sm = shing[m]
            if not slo and not sm:
                jac = 1.0
            elif not slo or not sm:
                jac = 0.0
            else:
                inter = len(slo & sm)
                jac = inter / (len(slo) + len(sm) - inter)
            if jac >= threshold:
                dup[m] = True
    ids = sorted(dup)
    return pd.DataFrame({"doc_id": ids, "is_neardup": [dup[i] for i in ids]})


def bpe_train_fixture(docs: pd.DataFrame, num_merges=60, max_words=30_000,
                      min_pair_count=2) -> pd.DataFrame:
    """Character-level BPE merges learned from word frequencies — NAIVE
    reference implementation: full pair recount every round (the stage
    maintains an incremental pair->words index; only the spec is shared).
    Spec: words = runs split on ASCII whitespace [ \\t\\n\\r\\f\\v]; top-K
    cut by (count desc, word asc); winning pair = max count, ties ->
    lexicographically smallest; stop when best count < min_pair_count."""
    import re as _re

    counts: dict[str, int] = {}
    splitter = _re.compile(r"[ \t\n\r\f\v]+")
    for text in docs["text"]:
        for w in splitter.split(text or ""):
            if w:
                counts[w] = counts.get(w, 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:max_words]
    seqs = {w: list(w) for w, _ in top}
    wcnt = dict(top)

    rows = []
    for rank in range(num_merges):
        pc_: dict[tuple[str, str], int] = {}
        for w, syms in seqs.items():
            c = wcnt[w]
            for j in range(len(syms) - 1):
                p = (syms[j], syms[j + 1])
                pc_[p] = pc_.get(p, 0) + c
        if not pc_:
            break
        best_c = max(pc_.values())
        if best_c < min_pair_count:
            break
        best = min(p for p, c in pc_.items() if c == best_c)
        rows.append({"rank": rank, "pair": best[0] + " " + best[1],
                     "cnt": best_c})
        new_sym = best[0] + best[1]
        for w, syms in seqs.items():
            merged, j = [], 0
            while j < len(syms):
                if (j < len(syms) - 1 and syms[j] == best[0]
                        and syms[j + 1] == best[1]):
                    merged.append(new_sym)
                    j += 2
                else:
                    merged.append(syms[j])
                    j += 1
            seqs[w] = merged
    df = pd.DataFrame(rows, columns=["rank", "pair", "cnt"])
    return df.astype({"rank": "int64", "cnt": "int64"})


def bpe_apply_fixture(docs: pd.DataFrame, num_merges=60, max_words=30_000,
                      min_pair_count=2) -> pd.DataFrame:
    """Per-doc token counts under the learned BPE — INDEPENDENT apply: the
    merges are applied to each word SEQUENTIALLY in rank order (classic
    subword-nmt order; the stage instead re-scans for the lowest-rank pair
    present — the two strategies provably coincide because a pair's operands
    must exist before it can be learned, so its rank exceeds the ranks that
    created them)."""
    import re as _re

    merges_df = bpe_train_fixture(docs, num_merges=num_merges,
                                  max_words=max_words,
                                  min_pair_count=min_pair_count)
    merges = [tuple(p.split(" ")) for p in merges_df["pair"]]
    splitter = _re.compile(r"[ \t\n\r\f\v]+")
    cache: dict[str, int] = {}

    def encode_len(w: str) -> int:
        n = cache.get(w)
        if n is not None:
            return n
        syms = list(w)
        for left, right in merges:
            j, out = 0, []
            while j < len(syms):
                if (j < len(syms) - 1 and syms[j] == left
                        and syms[j + 1] == right):
                    out.append(left + right)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = out
        cache[w] = len(syms)
        return cache[w]

    rows = []
    for did, text in zip(docs["doc_id"], docs["text"]):
        tot = sum(encode_len(w) for w in splitter.split(text or "") if w)
        rows.append({"doc_id": did, "bpe_tokens": tot})
    return pd.DataFrame(rows).astype({"doc_id": "int64",
                                      "bpe_tokens": "int64"})


def _unigram_best_suffix(word: str, counts: dict, total: int, L: int):
    """Top-down exact Viterbi (stage uses a bottom-up prefix DP): best
    segmentation of word[i:] maximizing prod(cnt)/total**k, ties -> fewer
    pieces then lexicographically smallest tuple.  Unknown single chars act
    as count-1 pieces."""
    memo: dict[int, tuple] = {}

    def best(i: int) -> tuple:
        if i == len(word):
            return (1, 0, ())
        got = memo.get(i)
        if got is not None:
            return got
        res = None
        for l in range(1, min(L, len(word) - i) + 1):
            p = word[i : i + l]
            c = counts.get(p)
            if c is None:
                if l > 1:
                    continue
                c = 1
            sub = best(i + l)
            cand = (c * sub[0], 1 + sub[1], (p,) + sub[2])
            if res is None:
                res = cand
            else:
                lhs = cand[0] * total ** res[1]
                rhs = res[0] * total ** cand[1]
                if lhs > rhs or (lhs == rhs
                                 and (cand[1], cand[2]) < (res[1], res[2])):
                    res = cand
        memo[i] = res
        return res

    return best(0)[2]


def unigram_train_fixture(docs: pd.DataFrame, vocab_size=60, max_piece_len=5,
                          em_iters=3, seed_size=400,
                          max_words=30_000) -> pd.DataFrame:
    """Unigram-LM (SentencePiece-style) vocab by hard EM — independent
    reimplementation of the spec in stages/unigram.py's docstring: ASCII-ws
    word counts, char + top-substring seeding, exact-integer Viterbi E-step
    (top-down here, bottom-up in the stage), char counts floored at 1,
    final vocab = chars + best multi pieces by (cnt desc, piece asc)."""
    import re as _re

    wc: dict[str, int] = {}
    splitter = _re.compile(r"[ \t\n\r\f\v]+")
    for text in docs["text"]:
        for w in splitter.split(text or ""):
            if w:
                wc[w] = wc.get(w, 0) + 1
    words = dict(sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:max_words])
    char_set = {ch for w in words for ch in w}

    # seed: chars + top substrings by weighted occurrence (overlaps count)
    chars: dict[str, int] = {}
    multi: dict[str, int] = {}
    for w, c in words.items():
        for i in range(len(w)):
            chars[w[i]] = chars.get(w[i], 0) + c
            for l in range(2, min(max_piece_len, len(w) - i) + 1):
                p = w[i : i + l]
                multi[p] = multi.get(p, 0) + c
    counts = dict(chars)
    counts.update(sorted(multi.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size])

    for _ in range(em_iters):
        total = sum(counts.values())
        new: dict[str, int] = {}
        for w, c in words.items():
            for p in _unigram_best_suffix(w, counts, total, max_piece_len):
                new[p] = new.get(p, 0) + c
        counts = {p: c for p, c in new.items() if c > 0 and len(p) > 1}
        for ch in char_set:
            counts[ch] = max(new.get(ch, 0), 1)

    cs = sorted(char_set)
    mu = sorted(((p, c) for p, c in counts.items() if len(p) > 1),
                key=lambda kv: (-kv[1], kv[0]))[: max(0, vocab_size - len(cs))]
    vocab = [(p, counts[p]) for p in cs] + mu
    vocab.sort(key=lambda kv: (-kv[1], kv[0]))
    return pd.DataFrame({
        "rank": pd.Series(range(len(vocab)), dtype="int64"),
        "piece": [p for p, _ in vocab],
        "cnt": pd.Series([c for _, c in vocab], dtype="int64"),
    })


def unigram_apply_fixture(docs: pd.DataFrame, vocab_size=60, max_piece_len=5,
                          em_iters=3, seed_size=400) -> pd.DataFrame:
    """Per-doc token counts under the trained unigram vocab (same exact
    Viterbi, unknown single chars = count 1)."""
    import re as _re

    v = unigram_train_fixture(docs, vocab_size=vocab_size,
                              max_piece_len=max_piece_len,
                              em_iters=em_iters, seed_size=seed_size)
    counts = {p: int(c) for p, c in zip(v["piece"], v["cnt"])}
    total = sum(counts.values())
    splitter = _re.compile(r"[ \t\n\r\f\v]+")
    cache: dict[str, int] = {}

    def ntok(w: str) -> int:
        n = cache.get(w)
        if n is None:
            n = len(_unigram_best_suffix(w, counts, total, max_piece_len))
            cache[w] = n
        return n

    rows = []
    for did, text in zip(docs["doc_id"], docs["text"]):
        tot = sum(ntok(w) for w in splitter.split(text or "") if w)
        rows.append({"doc_id": did, "unigram_tokens": tot})
    return pd.DataFrame(rows).astype({"doc_id": "int64",
                                      "unigram_tokens": "int64"})


def wordpiece_train_fixture(docs: pd.DataFrame, num_merges=60,
                            max_words=30_000,
                            min_pair_count=2) -> pd.DataFrame:
    """WordPiece vocab learned from word frequencies — NAIVE reference
    implementation: FULL pair+symbol recount every round (the stage in
    stages/wordpiece.py maintains an incremental pair->words index; only the
    spec is shared).  Spec: words split on ASCII whitespace; top-K cut by
    (count desc, word asc); symbols = first char bare, rest ##-prefixed;
    winning pair maximizes the EXACT fraction cnt(ab)/(cnt(a)*cnt(b))
    (cross-multiplied integer compare), ties -> higher pair count then
    lexicographically smallest (left, right); merge needs pair count >=
    min_pair_count; vocab = seed symbols sorted asc (initial counts) then
    merged pieces in merge order (cnt = pair count at merge)."""
    import re as _re
    from fractions import Fraction

    wcounts: dict[str, int] = {}
    splitter = _re.compile(r"[ \t\n\r\f\v]+")
    for text in docs["text"]:
        for w in splitter.split(text or ""):
            if w:
                wcounts[w] = wcounts.get(w, 0) + 1
    top = sorted(wcounts.items(), key=lambda kv: (-kv[1], kv[0]))[:max_words]
    seqs = {w: [w[0]] + ["##" + ch for ch in w[1:]] for w, _ in top}
    wcnt = dict(top)

    seed_counts: dict[str, int] = {}
    for w, syms in seqs.items():
        for s in syms:
            seed_counts[s] = seed_counts.get(s, 0) + wcnt[w]
    seeds = sorted(seed_counts.items())

    merge_rows = []
    for rank in range(num_merges):
        pc_: dict[tuple[str, str], int] = {}
        sc_: dict[str, int] = {}
        for w, syms in seqs.items():
            c = wcnt[w]
            for s in syms:
                sc_[s] = sc_.get(s, 0) + c
            for j in range(len(syms) - 1):
                p = (syms[j], syms[j + 1])
                pc_[p] = pc_.get(p, 0) + c
        best, best_score = None, None
        for p in sorted(pc_):
            cp = pc_[p]
            if cp < min_pair_count:
                continue
            score = Fraction(cp, sc_[p[0]] * sc_[p[1]])
            if (best is None or score > best_score
                    or (score == best_score and (-cp, p) < (-best[1], best[0]))):
                best, best_score = (p, cp), score
        if best is None:
            break
        (bl, br), bc = best
        new_sym = bl + (br[2:] if br.startswith("##") else br)
        merge_rows.append({"rank": rank + len(seeds), "piece": new_sym,
                           "cnt": bc})
        for w, syms in seqs.items():
            merged, j = [], 0
            while j < len(syms):
                if (j < len(syms) - 1 and syms[j] == bl
                        and syms[j + 1] == br):
                    merged.append(new_sym)
                    j += 2
                else:
                    merged.append(syms[j])
                    j += 1
            seqs[w] = merged
    rows = [{"rank": i, "piece": p, "cnt": c}
            for i, (p, c) in enumerate(seeds)] + merge_rows
    return pd.DataFrame(rows, columns=["rank", "piece", "cnt"]).astype(
        {"rank": "int64", "cnt": "int64"})


def wordpiece_apply_fixture(docs: pd.DataFrame, num_merges=60,
                            max_words=30_000,
                            min_pair_count=2) -> pd.DataFrame:
    """Per-doc token counts under the trained WordPiece vocab — greedy
    longest-match-first (BERT semantics: any uncovered position makes the
    whole word one [UNK]); empty word contributes nothing."""
    import re as _re

    v = wordpiece_train_fixture(docs, num_merges=num_merges,
                                max_words=max_words,
                                min_pair_count=min_pair_count)
    vocab = set(v["piece"])
    splitter = _re.compile(r"[ \t\n\r\f\v]+")
    cache: dict[str, int] = {}

    def ntok(w: str) -> int:
        n = cache.get(w)
        if n is not None:
            return n
        toks, i = 0, 0
        while i < len(w):
            end = len(w)
            hit = None
            while end > i:
                cand = w[i:end] if i == 0 else "##" + w[i:end]
                if cand in vocab:
                    hit = end
                    break
                end -= 1
            if hit is None:
                toks = 1  # whole word -> [UNK]
                break
            toks += 1
            i = hit
        n = toks if toks else 1
        cache[w] = n
        return n

    rows = []
    for did, text in zip(docs["doc_id"], docs["text"]):
        tot = sum(ntok(w) for w in splitter.split(text or "") if w)
        rows.append({"doc_id": did, "wordpiece_tokens": tot})
    return pd.DataFrame(rows).astype({"doc_id": "int64",
                                      "wordpiece_tokens": "int64"})


def wordpiece_pack_fixture(docs: pd.DataFrame, seq_len=128, num_merges=60,
                           max_words=30_000,
                           min_pair_count=2) -> pd.DataFrame:
    """Tokenize-to-training-sequences — NAIVE reference implementation of
    stages/pack_ids.py: train the WordPiece vocab, greedy-encode each doc to
    RANK ids (unknown word -> unk_id = len(vocab); eos_id = len(vocab)+1
    appended after every doc), concatenate the whole corpus in ascending
    doc_id order ON THE DRIVER, slice every seq_len tokens, drop the
    trailing partial.  Output per sequence: (seq_id, n_tokens, idhash) with
    idhash = sum(ids[i] * 1000003^(seq_len-1-i)) mod 2^64 viewed as int64
    (order-sensitive — pins byte-identical sequences)."""
    import re as _re

    v = wordpiece_train_fixture(docs, num_merges=num_merges,
                                max_words=max_words,
                                min_pair_count=min_pair_count)
    p2i = {p: int(r) for r, p in zip(v["rank"], v["piece"])}
    vocab = set(p2i)
    unk, eos = len(v), len(v) + 1
    splitter = _re.compile(r"[ \t\n\r\f\v]+")
    cache: dict[str, list[int]] = {}

    def word_ids(w: str) -> list[int]:
        ids = cache.get(w)
        if ids is not None:
            return ids
        out, i = [], 0
        while i < len(w):
            end, hit = len(w), None
            while end > i:
                cand = w[i:end] if i == 0 else "##" + w[i:end]
                if cand in vocab:
                    hit = end
                    break
                end -= 1
            if hit is None:
                out = [unk]
                break
            out.append(p2i[cand])
            i = hit
        out = out if out else [unk]
        cache[w] = out
        return out

    stream: list[int] = []
    order = sorted(zip(docs["doc_id"], docs["text"]), key=lambda t: t[0])
    for _, text in order:
        for w in splitter.split(text or ""):
            if w:
                stream.extend(word_ids(w))
        stream.append(eos)

    pows = [pow(1000003, seq_len - 1 - i, 2 ** 64) for i in range(seq_len)]
    rows = []
    for sid in range(len(stream) // seq_len):
        seq = stream[sid * seq_len:(sid + 1) * seq_len]
        h = sum(t * p for t, p in zip(seq, pows)) % 2 ** 64
        if h >= 2 ** 63:
            h -= 2 ** 64
        rows.append({"seq_id": sid, "n_tokens": seq_len, "idhash": h})
    return pd.DataFrame(rows, columns=["seq_id", "n_tokens", "idhash"]).astype(
        {"seq_id": "int64", "n_tokens": "int64", "idhash": "int64"})


def winnow_fixture(docs: pd.DataFrame, k=8, w=4) -> pd.DataFrame:
    """Winnowing fingerprints per doc: unique window-of-w minima over the
    shingle hashes; count + xor-fold digest (int64 view)."""
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        h = _doc_shingle_hashes(text, k)
        fps = {int(min(h[i : i + w])) for i in range(max(len(h) - w + 1, 0))}
        digest = 0
        for f in fps:
            digest ^= f
        rows.append({
            "doc_id": int(doc_id),
            "n_fingerprints": len(fps),
            "fp_digest": int(np.uint64(digest).astype(np.int64)),
        })
    return pd.DataFrame(rows).sort_values("doc_id").reset_index(drop=True)


def fingerprint_overlap_fixture(docs: pd.DataFrame, k=8, w=4,
                                min_shared=30, freq_cap=128) -> pd.DataFrame:
    """Doc pairs sharing >= min_shared winnowed fingerprints; fingerprints
    held by > freq_cap docs are dropped (matches the stage's boilerplate
    cap)."""
    fp_to_docs: dict[int, list[int]] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        h = _doc_shingle_hashes(text, k)
        fps = {int(min(h[i : i + w])) for i in range(max(len(h) - w + 1, 0))}
        for f in fps:
            fp_to_docs.setdefault(f, []).append(int(doc_id))
    pair_counts: dict[tuple[int, int], int] = {}
    for ids in fp_to_docs.values():
        if len(ids) < 2 or len(ids) > freq_cap:
            continue
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pair_counts[(ids[i], ids[j])] = pair_counts.get(
                    (ids[i], ids[j]), 0) + 1
    rows = [
        {"id_a": a_, "id_b": b_, "shared": c}
        for (a_, b_), c in pair_counts.items() if c >= min_shared
    ]
    out = pd.DataFrame(rows or {"id_a": [], "id_b": [], "shared": []})
    return out.astype("int64").sort_values(["id_a", "id_b"]).reset_index(drop=True)


# --------------------------------------------------------------------------- #
# simhash — per-doc/per-token python polynomial hash + hamming bands
# --------------------------------------------------------------------------- #


def _simhash_doc(text: str, seed: int = 29) -> int:
    mix = (0x9E3779B97F4A7C15 + seed) & M64
    C = 0xC2B2AE3D27D4EB4F
    bit_sums = [0] * 64
    for tok in re.split(r"\s+", text or ""):
        h = 0
        for j, byte in enumerate(tok.encode("utf-8")):
            h = (h + byte * pow(FNV_B, j, 1 << 64)) & M64
        h = (((h * mix) & M64) ^ (h >> 13)) & M64
        h = (h * C) & M64
        for i in range(64):
            bit_sums[i] += 1 if (h >> i) & 1 else -1
    return sum((1 << i) for i in range(64) if bit_sums[i] > 0)


def simhash_fixture(docs: pd.DataFrame, n_bands: int = 4) -> pd.DataFrame:
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        h = _simhash_doc(text)
        for bi in range(n_bands):
            bk = (h >> (16 * bi)) & 0xFFFF
            buckets.setdefault((bi, bk), []).append(int(doc_id))
    dup = {int(d): False for d in docs["doc_id"]}
    for members in buckets.values():
        lo = min(members)
        for m in members:
            if m != lo:
                dup[m] = True
    ids = sorted(dup)
    return pd.DataFrame({"doc_id": ids, "is_neardup": [dup[i] for i in ids]})


# --------------------------------------------------------------------------- #
# embedding near-dup + LSH ANN — numpy per-bucket loops
# --------------------------------------------------------------------------- #


def _bucket_ids(M: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (M @ planes.T) > 0
    return bits.astype(np.int64) @ (1 << np.arange(planes.shape[0], dtype=np.int64))


def embedding_neardup_fixture(emb: pd.DataFrame, threshold=0.9, n_planes=12,
                              seed=7) -> pd.DataFrame:
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    planes = np.random.default_rng(seed).standard_normal((n_planes, M.shape[1]))
    bk = _bucket_ids(M, planes)
    dup = {int(i): False for i in ids}
    for b in np.unique(bk):
        members = np.sort(ids[bk == b])
        sub = {int(i): M[np.where(ids == i)[0][0]] for i in members}
        for i_pos in range(1, len(members)):
            vi = sub[int(members[i_pos])]
            ni = np.linalg.norm(vi)
            for j_pos in range(i_pos):
                vj = sub[int(members[j_pos])]
                cos = float(vi @ vj) / max(np.linalg.norm(vj) * ni, 1e-30)
                if cos >= threshold:
                    dup[int(members[i_pos])] = True
                    break
    sids = sorted(dup)
    return pd.DataFrame({"vec_id": sids, "is_neardup": [dup[i] for i in sids]})


def ivf_ann_fixture(emb: pd.DataFrame, k=10, n_centroids=16, n_probe=4,
                    sample_rows=2000, seed=11, iters=10) -> pd.DataFrame:
    """IVF top-k: reimplements the seeded spherical-k-means quantizer and
    probe search whole-matrix (stage computes per batch)."""
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    sample = M[:sample_rows]
    rng = np.random.default_rng(seed)
    S = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-30)
    idx = rng.choice(len(S), size=min(n_centroids, len(S)), replace=False)
    C = S[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(S @ C.T, axis=1)
        for c in range(len(C)):
            members = S[assign == c]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 1e-30:
                    C[c] = m / n
    q = M[np.where(ids == 0)[0][0]]
    qn = q / np.linalg.norm(q)
    probes = set(int(p) for p in np.argsort(-(C @ qn))[:n_probe])
    norms = np.maximum(np.linalg.norm(M, axis=1), 1e-30)
    assign = np.argmax((M / norms[:, None]) @ C.T, axis=1)
    mask = np.isin(assign, list(probes))
    sims = (M[mask] @ qn) / norms[mask]
    cids = ids[mask]
    order = sorted(range(len(cids)), key=lambda i: (-sims[i], cids[i]))[:k]
    rows = sorted(((int(cids[i]), round(float(sims[i]), 6)) for i in order))
    return pd.DataFrame({"vec_id": [r[0] for r in rows], "sim": [r[1] for r in rows]})


def lsh_ann_fixture(emb: pd.DataFrame, k=10, n_planes=8, seed=7) -> pd.DataFrame:
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    q = M[np.where(ids == 0)[0][0]]
    planes = np.random.default_rng(seed).standard_normal((n_planes, q.shape[0]))
    qb = int(_bucket_ids(q[None, :], planes)[0])
    qn = q / np.linalg.norm(q)
    bk = _bucket_ids(M, planes)
    cand = bk == qb
    sims = (M[cand] @ qn) / np.maximum(np.linalg.norm(M[cand], axis=1), 1e-30)
    cids = ids[cand]
    order = sorted(range(len(cids)), key=lambda i: (-sims[i], cids[i]))[:k]
    rows = sorted(((int(cids[i]), round(float(sims[i]), 6)) for i in order))
    return pd.DataFrame({"vec_id": [r[0] for r in rows], "sim": [r[1] for r in rows]})


# --------------------------------------------------------------------------- #


def semdedup_fixture(emb: pd.DataFrame, threshold=0.9, n_centroids=16,
                     sample_rows=2000, seed=13, iters=10) -> pd.DataFrame:
    """SemDeDup: reimplements the seeded quantizer + per-cluster greedy
    keep-first prune with plain loops."""
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    sample = M[:sample_rows]
    rng = np.random.default_rng(seed)
    S = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-30)
    idx = rng.choice(len(S), size=min(n_centroids, len(S)), replace=False)
    C = S[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(S @ C.T, axis=1)
        for c in range(len(C)):
            members = S[assign == c]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 1e-30:
                    C[c] = m / n
    norms = np.maximum(np.linalg.norm(M, axis=1), 1e-30)
    Mn = M / norms[:, None]
    assign = np.argmax(Mn @ C.T, axis=1)
    out_ids, out_cl, out_dup = [], [], []
    for c in sorted(set(int(a) for a in assign)):
        rows = np.where(assign == c)[0]
        rows = rows[np.argsort(ids[rows], kind="stable")]
        kept = []
        for r in rows:
            dup = False
            if kept:
                sims = Mn[kept] @ Mn[r]
                dup = bool((sims >= threshold).any())
            if not dup:
                kept.append(r)
            out_ids.append(int(ids[r]))
            out_cl.append(c)
            out_dup.append(dup)
    df = pd.DataFrame({"vec_id": out_ids, "cluster": out_cl, "is_dup": out_dup})
    return df.sort_values("vec_id", kind="mergesort").reset_index(drop=True)


# --------------------------------------------------------------------------- #
# fastText-shape classifier — per-doc python feature loops + sequential
# float64 accumulation (mirrors the published spec constants only)
# --------------------------------------------------------------------------- #

CL_DIM, CL_BUCKETS, CL_SEED, CL_SAMPLE_N = 16, 1 << 16, 41, 200
CL_MIX1, CL_MIX2 = 0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F
CL_BIGRAM = 0x100000001B3


def _cl_tok_hash(tok: str) -> int:
    by = tok.encode("utf-8")
    h = 0
    p = 1
    for b in by:
        h = (h + b * p) & M64
        p = (p * FNV_B) & M64
    h ^= (len(by) * CL_MIX1) & M64
    h = ((h * CL_MIX1) & M64) ^ (h >> 29)
    return (h * CL_MIX2) & M64


def _cl_doc_vec(text: str, E: np.ndarray) -> tuple[np.ndarray, int]:
    toks = [t for t in (text or "").split(" ") if t]
    uh = [_cl_tok_hash(t) for t in toks]
    bi = [((uh[i] * CL_BIGRAM) + uh[i + 1]) & M64 for i in range(len(uh) - 1)]
    ids = [u % CL_BUCKETS for u in uh] + [b % CL_BUCKETS for b in bi]
    s = np.zeros(CL_DIM, dtype=np.float64)
    for fid in ids:  # sequential float64 accumulation (spec)
        s += E[fid]
    if ids:
        s /= len(ids)
    return s, len(ids)


def fasttext_fixture(docs: pd.DataFrame) -> pd.DataFrame:
    rng = np.random.Generator(np.random.PCG64(CL_SEED))
    E = (rng.random((CL_BUCKETS, CL_DIM), dtype=np.float32) - 0.5).astype(np.float32)
    docs = docs.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    sample = docs[docs.doc_id < CL_SAMPLE_N]
    classes = sorted(sample["lang"].dropna().unique().tolist())
    sums = {c: np.zeros(CL_DIM) for c in classes}
    counts = {c: 0 for c in classes}
    vecs_cache = {}
    for _, row in sample.iterrows():
        v, _nf = _cl_doc_vec(row["text"], E)
        vecs_cache[row["doc_id"]] = v
        if row["lang"] in sums:
            sums[row["lang"]] += v
            counts[row["lang"]] += 1
    cents = np.array(
        [sums[c] / counts[c] if counts[c] else np.zeros(CL_DIM) for c in classes]
    )
    preds, scores = [], []
    for _, row in docs.iterrows():
        v, nf = _cl_doc_vec(row["text"], E)
        if nf == 0:
            preds.append("unknown")
            scores.append(0.0)
            continue
        logit = np.zeros(len(classes))
        for ci in range(len(classes)):
            s = 0.0
            for d in range(CL_DIM):  # sequential dot (spec)
                s += v[d] * cents[ci][d]
            logit[ci] = s
        best = int(np.argmax(logit))
        preds.append(classes[best])
        scores.append(round(float(logit[best]), 6))
    return pd.DataFrame(
        {"doc_id": docs["doc_id"].to_numpy(), "pred_label": preds,
         "pred_score": np.array(scores, dtype=np.float64)}
    )


# --------------------------------------------------------------------------- #
# DSIR importance resampling — independent per-doc reimplementation.
# Spec constants (stages/dsir.py): D buckets, lowercase [a-z0-9_]+ tokens,
# crc32 bucket hash, unigrams+bigrams, add_k=0.01 smoothing, logw rounded to
# 6dp before the crc32-seeded Gumbel key, k = n//4, target = lang == 'en'.
# --------------------------------------------------------------------------- #

DSIR_D = 16384
DSIR_TOKEN = re.compile(r"[a-z0-9_]+")


def _dsir_doc_counts(text: str) -> dict[int, int]:
    from zlib import crc32 as _crc

    toks = DSIR_TOKEN.findall((text or "").lower())
    cnt: dict[int, int] = {}
    for t in toks:
        b = _crc(t.encode()) % DSIR_D
        cnt[b] = cnt.get(b, 0) + 1
    for i in range(len(toks) - 1):
        b = _crc((toks[i] + " " + toks[i + 1]).encode()) % DSIR_D
        cnt[b] = cnt.get(b, 0) + 1
    return cnt


def dsir_fixture(docs: pd.DataFrame, add_k: float = 0.01, seed: int = 0) -> pd.DataFrame:
    from zlib import crc32 as _crc

    docs = docs.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    per_doc = [_dsir_doc_counts(t) for t in docs["text"]]

    def bag_log_probs(rows: list[dict[int, int]]) -> np.ndarray:
        counts = np.zeros(DSIR_D, dtype=np.float64)
        for c in rows:
            for b, n in c.items():
                counts[b] += n
        sm = counts + add_k
        return np.log(sm / sm.sum())

    is_target = (docs["lang"] == "en").to_numpy()
    log_p = bag_log_probs([c for c, t in zip(per_doc, is_target) if t])
    log_q = bag_log_probs(per_doc)
    ratio = log_p - log_q

    logw = np.empty(len(docs), dtype=np.float64)
    for i, c in enumerate(per_doc):
        if not c:
            logw[i] = 0.0
            continue
        bs = sorted(c)  # ascending buckets (summation-order spec)
        cs = np.array([c[b] for b in bs], dtype=np.float64)
        logw[i] = float(np.sum(cs * ratio[np.array(bs)]))
    logw_r = np.round(logw, 6)

    ids = docs["doc_id"].to_numpy()
    u = np.array([_crc(f"{seed}:{d}".encode()) for d in ids.tolist()],
                 dtype=np.float64)
    u = (u + 1.0) / 4294967297.0
    key = logw_r - np.log(-np.log(u))

    k = max(1, len(docs) // 4)
    thresh = np.sort(key)[-k]
    return pd.DataFrame({
        "doc_id": ids,
        "logw": logw_r,
        "selected": key >= thresh,
    })


# --------------------------------------------------------------------------- #
# Kneser-Ney bigram perplexity — per-doc python loops + dict counts of the
# hashed-bigram SPEC (stages/kn_lm.py docstring: W=4096 crc32 word ids,
# d=0.75 interpolated KN over same-doc adjacent pairs, EPS=2^-40 floor,
# 1e6 short-doc sentinel).  Per-doc log-prob totals use the same IEEE
# left-to-right reduce the engine's reduceat performs.
# --------------------------------------------------------------------------- #

KN_W, KN_D, KN_EPS = 4096, 0.75, 2.0 ** -40


def kn_ppl_fixture(docs: pd.DataFrame) -> pd.DataFrame:
    from zlib import crc32 as _crc

    docs = docs.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    seqs = []
    for t in docs["text"]:
        toks = DSIR_TOKEN.findall((t or "").lower())
        seqs.append([_crc(w.encode()) % KN_W for w in toks])

    big: dict[tuple[int, int], int] = {}
    for s in seqs:
        for a, b in zip(s, s[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    c_ctx: dict[int, int] = {}
    n1_after: dict[int, int] = {}
    before_sets: dict[int, set] = {}
    for (a, b), c in big.items():
        c_ctx[a] = c_ctx.get(a, 0) + c
        n1_after[a] = n1_after.get(a, 0) + 1
        before_sets.setdefault(b, set()).add(a)
    n_types = max(len(big), 1)

    ppl = np.full(len(docs), 1e6, dtype=np.float64)
    for i, s in enumerate(seqs):
        if len(s) < 2:
            continue
        lps = []
        for a, b in zip(s, s[1:]):
            pcont = len(before_sets.get(b, ())) / n_types
            cu = c_ctx.get(a, 0)
            if cu > 0:
                p = (max(big.get((a, b), 0) - KN_D, 0.0) / cu
                     + KN_D * n1_after[a] / cu * pcont)
            else:
                p = pcont
            lps.append(np.log2(np.maximum(p, KN_EPS)))
        total = np.add.reduceat(np.array(lps, dtype=np.float64), [0])[0]
        ppl[i] = 2.0 ** (-(total / (len(s) - 1)))
    return pd.DataFrame({"doc_id": docs["doc_id"].to_numpy(),
                         "perplexity": np.round(ppl, 6)})


# --------------------------------------------------------------------------- #
# distributed k-means / PCA — whole-matrix numpy reimplementations of the
# fixed-point accumulation SPEC (scale bits, splitmix init, sign convention);
# the stages compute the same integer sums per batch + Python-int fold.
# --------------------------------------------------------------------------- #

KM_SCALE_BITS, KM_K, KM_ITERS, KM_SEED = 34, 8, 6, 0
PCA_SCALE_BITS, PCA_NCOMP = 20, 2


def _splitmix64_one(x: int) -> int:
    z = (x + 0x9E3779B97F4A7C15) & M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
    return z ^ (z >> 31)


def kmeans_fixture(emb: pd.DataFrame) -> pd.DataFrame:
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy().astype(np.int64)

    def unit(X):
        return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)

    keys = [(_splitmix64_one((int(i) & M64) ^ KM_SEED), int(i)) for i in ids]
    pick = [i for _, i in sorted(zip(keys, range(len(ids))))[:KM_K]]
    C = unit(M[pick].copy())

    scale = float(1 << KM_SCALE_BITS)
    Xn = unit(M)
    for _ in range(KM_ITERS):
        assign = np.argmax(Xn @ C.T, axis=1)
        Q = np.rint(Xn * scale).astype(np.int64)
        for c in range(KM_K):
            members = Q[assign == c]
            if len(members):
                s = [int(v) for v in members.sum(axis=0)]  # exact at this n
                m = np.array([float(v) for v in s], dtype=np.float64)
                m /= scale * len(members)
                nrm = np.linalg.norm(m)
                if nrm > 1e-30:
                    C[c] = m / nrm
    sims = Xn @ C.T
    assign = np.argmax(sims, axis=1)
    best = np.round(sims[np.arange(len(assign)), assign], 6)
    return pd.DataFrame({"vec_id": ids, "cluster": assign.astype(np.int64),
                         "sim": best}).sort_values("vec_id",
                                                   kind="mergesort").reset_index(drop=True)


def pca_fixture(emb: pd.DataFrame) -> pd.DataFrame:
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    n = M.shape[0]
    dim = M.shape[1]
    Q = np.rint(M * float(1 << PCA_SCALE_BITS)).astype(np.int64)
    S = [int(v) for v in Q.sum(axis=0)]
    G = Q.T @ Q  # exact int64 at this n
    denom = float((1 << (2 * PCA_SCALE_BITS)) * n * (n - 1))
    cov = np.empty((dim, dim), dtype=np.float64)
    for i in range(dim):
        for j in range(i, dim):
            num = n * int(G[i, j]) - S[i] * S[j]
            cov[i, j] = cov[j, i] = float(num) / denom
    mean = np.array([float(s) for s in S], dtype=np.float64)
    mean /= float((1 << PCA_SCALE_BITS) * n)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:PCA_NCOMP]
    comps = evecs[:, order].T.copy()
    for r in range(comps.shape[0]):
        piv = int(np.argmax(np.abs(comps[r])))
        if comps[r, piv] < 0:
            comps[r] = -comps[r]
    scores = np.round((M - mean) @ comps.T, 6)
    return pd.DataFrame({"vec_id": ids, "pc1": scores[:, 0],
                         "pc2": scores[:, 1]}).sort_values(
        "vec_id", kind="mergesort").reset_index(drop=True)


LR_SCALE_X, LR_SCALE_G, LR_ITERS, LR_LR = 20, 40, 8, 2.0


def logreg_fixture(docs: pd.DataFrame) -> pd.DataFrame:
    """Distributed logistic regression (stages/logreg.py) spec: quantized
    fastText-architecture doc vectors + bias, dimension-sequential margins,
    per-row gradient quantization at 2^LR_SCALE_G before exact integer sums,
    LR_ITERS full-batch GD steps at lr=LR_LR; target = lang == 'en'."""
    rng = np.random.Generator(np.random.PCG64(CL_SEED))
    E = (rng.random((CL_BUCKETS, CL_DIM), dtype=np.float32) - 0.5).astype(np.float32)
    docs = docs.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    n = len(docs)
    X = np.empty((n, CL_DIM + 1), dtype=np.float64)
    for i, text in enumerate(docs["text"]):
        v, _nf = _cl_doc_vec(text, E)
        xq = np.rint(v * float(1 << LR_SCALE_X)).astype(np.int64)
        X[i, :CL_DIM] = xq.astype(np.float64) / float(1 << LR_SCALE_X)
    X[:, CL_DIM] = 1.0
    y = (docs["lang"] == "en").to_numpy().astype(np.float64)

    def margins(w: np.ndarray) -> np.ndarray:
        acc = np.zeros(n, dtype=np.float64)
        for d in range(CL_DIM + 1):  # sequential dot (spec)
            acc += X[:, d] * w[d]
        return acc

    w = np.zeros(CL_DIM + 1, dtype=np.float64)
    for _ in range(LR_ITERS):
        p = 1.0 / (1.0 + np.exp(-margins(w)))
        gq = np.rint(((p - y)[:, None] * X) * float(1 << LR_SCALE_G)).astype(np.int64)
        G = [int(v) for v in gq.sum(axis=0)]  # exact at this n
        denom = float(1 << LR_SCALE_G) * n
        w = np.array([w[j] - LR_LR * (float(G[j]) / denom)
                      for j in range(CL_DIM + 1)], dtype=np.float64)

    m = margins(w)
    prob = np.round(1.0 / (1.0 + np.exp(-m)), 6)
    return pd.DataFrame({
        "doc_id": docs["doc_id"].to_numpy(),
        "prob": prob,
        "pred": (m >= 0).astype(np.int64),
    })


PQ_M, PQ_NCODES, PQ_ITERS, PQ_SEED = 4, 16, 6, 5


def pq_fixture(emb: pd.DataFrame) -> pd.DataFrame:
    """Product quantization (Jégou et al. 2011) spec reimplementation:
    unit rows, splitmix64 bottom-ncodes init, per-subspace Euclidean Lloyd
    with exact-int quantized sums (KM_SCALE_BITS fixed point), base-ncodes
    packed code, ADC vs the vec_id=0 query (sequential subspace sum)."""
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    n, dim = M.shape
    subdim = dim // PQ_M
    Xn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)

    keys = [(_splitmix64_one((int(i) & M64) ^ PQ_SEED), int(i)) for i in ids]
    pick = [i for _, i in sorted(zip(keys, range(n)))[:PQ_NCODES]]
    C = np.stack([Xn[pick, s * subdim:(s + 1) * subdim].copy()
                  for s in range(PQ_M)])  # (m, ncodes, subdim)

    scale = float(1 << KM_SCALE_BITS)
    Q = np.rint(Xn * scale).astype(np.int64)

    def assign_all(Cb: np.ndarray) -> np.ndarray:
        codes = np.empty((n, PQ_M), dtype=np.int64)
        for s in range(PQ_M):
            V = Xn[:, s * subdim:(s + 1) * subdim]
            Cs = Cb[s]
            codes[:, s] = np.argmax(
                V @ Cs.T - 0.5 * (Cs * Cs).sum(axis=1)[None, :], axis=1)
        return codes

    for _ in range(PQ_ITERS):
        codes = assign_all(C)
        for s in range(PQ_M):
            Qs = Q[:, s * subdim:(s + 1) * subdim]
            for c in range(PQ_NCODES):
                members = Qs[codes[:, s] == c]
                if len(members):
                    tot = [int(v) for v in members.sum(axis=0)]  # exact
                    C[s, c] = np.array([float(v) for v in tot],
                                       dtype=np.float64) / (scale * len(members))

    codes = assign_all(C)
    packed = np.zeros(n, dtype=np.int64)
    for s in range(PQ_M - 1, -1, -1):
        packed = packed * PQ_NCODES + codes[:, s]

    q = M[ids == 0][0]
    qn = q / max(np.linalg.norm(q), 1e-30)
    lut = np.stack([C[s] @ qn[s * subdim:(s + 1) * subdim]
                    for s in range(PQ_M)])
    adc = np.zeros(n, dtype=np.float64)
    for s in range(PQ_M):
        adc = adc + lut[s][codes[:, s]]
    return pd.DataFrame({"vec_id": ids, "code": packed,
                         "adc": np.round(adc, 6)}).sort_values(
        "vec_id", kind="mergesort").reset_index(drop=True)


def media_dhash_fixture(docs: pd.DataFrame) -> pd.DataFrame:
    """Independent dHash + Hamming-band near-dup marking over the probe
    images of the media_decode_stats 'image/dhash' arm.

    The probe-image FORMULA is the shared input spec (demo_queries
    ``_dhash_probe_image``); the OPERATOR — PPM-decode grayscale, 8x9
    nearest resize, gradient bits, 4x16-bit band blocking, keeper-verified
    Hamming <= 3 — is reimplemented here with explicit per-pixel loops,
    none of the stages/multimodal execution code."""
    def probe(doc_id: int) -> np.ndarray:
        g = doc_id // 10
        seed = g if doc_id % 10 in (0, 1) else 1_000_000 + doc_id
        idx = np.arange(16 * 16 * 3, dtype=np.uint64)
        v = (np.uint64(seed) * np.uint64(2654435761)
             + idx * np.uint64(2246822519))
        v ^= v >> np.uint64(33)
        v *= np.uint64(0xFF51AFD7ED558CCD)
        v ^= v >> np.uint64(29)
        px = (v % np.uint64(200)).astype(np.uint8)
        img = px.reshape(16, 16, 3)
        if doc_id % 10 == 1:
            img = img + np.uint8(20)
        return img

    def dhash_loops(img: np.ndarray) -> int:
        # decoder contract: grayscale = channel mean / 255 (float); resize
        # nearest to 8 rows x 9 cols; bit = left<right gradient, row-major
        h, w = img.shape[:2]
        gray = [[(int(img[r][c][0]) + int(img[r][c][1]) + int(img[r][c][2]))
                 / 3.0 / 255.0 for c in range(w)] for r in range(h)]
        rows = [min((r * h) // 8, h - 1) for r in range(8)]
        cols = [min((c * w) // 9, w - 1) for c in range(9)]
        bits = 0
        for r in range(8):
            for c in range(8):
                a = gray[rows[r]][cols[c + 1]]
                b = gray[rows[r]][cols[c]]
                bits = (bits << 1) | (1 if a > b else 0)
        return bits

    ids = sorted(int(i) for i in docs["doc_id"])
    hashes = {i: dhash_loops(probe(i)) for i in ids}
    marked = {i: False for i in ids}
    for band in range(4):
        groups: dict[int, list[int]] = {}
        for i in ids:
            groups.setdefault((hashes[i] >> (16 * band)) & 0xFFFF,
                              []).append(i)
        for members in groups.values():
            members.sort()
            keeper = members[0]
            for m in members[1:]:
                if bin(hashes[m] ^ hashes[keeper]).count("1") <= 3:
                    marked[m] = True
    return pd.DataFrame({
        "doc_id": ids,
        "dhash63": np.array([hashes[i] & ((1 << 63) - 1) for i in ids],
                            dtype=np.int64),
        "is_neardup": [marked[i] for i in ids],
    })


def media_video_fixture(docs: pd.DataFrame) -> pd.DataFrame:
    """Independent video-fingerprint + Hamming-band near-dup marking over
    the probe videos of the media_decode_stats 'video/fp' arm.

    The probe-frame FORMULA is the shared input spec (demo_queries
    ``_video_probe_frames``); the OPERATOR — integer ITU-601 luma dHash per
    frame, per-bit majority-vote signature, frame-hash star buckets
    (keeper = min id) and member marking at shared-frames >=
    0.6 * min(n_frames) — is reimplemented here with explicit loops, none
    of the stages/multimodal execution code."""
    N_FRAMES = 5

    def frame_img(seed: int) -> np.ndarray:
        idx = np.arange(16 * 16 * 3, dtype=np.uint64)
        v = (np.uint64(seed) * np.uint64(2654435761)
             + idx * np.uint64(2246822519))
        v ^= v >> np.uint64(33)
        v *= np.uint64(0xFF51AFD7ED558CCD)
        v ^= v >> np.uint64(29)
        px = (v % np.uint64(200)).astype(np.uint8)
        return px.reshape(16, 16, 3)

    def frames_for(doc_id: int) -> list:
        base = (doc_id // 10 if doc_id % 10 in (0, 1)
                else 1_000_000 + doc_id)
        frames = [frame_img(base * 1000 + f) for f in range(N_FRAMES)]
        if doc_id % 10 == 1:
            # near-dup twin: one frame brightness-shifted (dHash-invariant)
            # and one frame re-rendered (a minority the majority vote eats)
            frames[0] = frames[0] + np.uint8(20)
            frames[4] = frame_img((2_000_000 + doc_id) * 1000 + 4)
        return frames

    def dhash_int_luma_loops(img: np.ndarray) -> int:
        # operator contract for raw uint8 frames: exact integer ITU-R 601
        # luma, 8x9 nearest resize, bit = right>left gradient, row-major
        h, w = img.shape[:2]
        gray = [[(299 * int(img[r][c][0]) + 587 * int(img[r][c][1])
                  + 114 * int(img[r][c][2])) // 1000
                 for c in range(w)] for r in range(h)]
        rows = [min((r * h) // 8, h - 1) for r in range(8)]
        cols = [min((c * w) // 9, w - 1) for c in range(9)]
        bits = 0
        for r in range(8):
            for c in range(8):
                a = gray[rows[r]][cols[c + 1]]
                b = gray[rows[r]][cols[c]]
                bits = (bits << 1) | (1 if a > b else 0)
        return bits

    def majority_fp(hashes: list) -> int:
        fp = 0
        for bit in range(64):
            ones = sum((h >> bit) & 1 for h in hashes)
            if 2 * ones > len(hashes):
                fp |= 1 << bit
        return fp

    MIN_OVERLAP = 0.6

    ids = sorted(int(i) for i in docs["doc_id"])
    frame_hashes = {i: [dhash_int_luma_loops(f) for f in frames_for(i)]
                    for i in ids}
    fps = {i: majority_fp(frame_hashes[i]) for i in ids}
    # frame-hash star buckets: keeper = min id sharing the hash; count
    # shared frames per (keeper, member) pair; mark member at >= 60 % of
    # the smaller video's frame count
    buckets: dict[int, list[int]] = {}
    for i in ids:
        for fh in sorted(set(frame_hashes[i])):
            buckets.setdefault(fh, []).append(i)
    shared: dict[tuple[int, int], int] = {}
    for members in buckets.values():
        members.sort()
        keeper = members[0]
        for m in members[1:]:
            shared[(keeper, m)] = shared.get((keeper, m), 0) + 1
    marked = {i: False for i in ids}
    n_frames = {i: N_FRAMES for i in ids}  # every probe video has 5 frames
    for (a, b), s in shared.items():
        if s >= MIN_OVERLAP * min(n_frames[a], n_frames[b]):
            marked[b] = True
    return pd.DataFrame({
        "doc_id": ids,
        "vfp63": np.array([fps[i] & ((1 << 63) - 1) for i in ids],
                          dtype=np.int64),
        "n_frames": np.full(len(ids), N_FRAMES, dtype=np.int32),
        "is_neardup": [marked[i] for i in ids],
    })



def media_logmel_fixture(docs: pd.DataFrame) -> pd.DataFrame:
    """Independent log-mel spectrogram features over the audio probes of the
    media_decode_stats 'audio/logmel' arm.

    The probe-signal FORMULA is the shared input spec (demo_queries
    ``_logmel_probe_wave``: n = 800 + (doc_id % 5)*160 samples of a
    round(8000*sin(2*pi*f*t/16000)) int16 tone, f = 200 + (doc_id % 16)*450
    Hz, 16 kHz).  The OPERATOR — Hann window, per-frame rfft power, HTK-mel
    triangular filterbank, log, per-band (mean, std) pooling, float32 cast,
    scalar mean — is reimplemented here with explicit per-frame and
    per-bin loops, none of the stages/multimodal execution code."""
    RATE, FRAME, HOP, N_MELS = 16000, 400, 160, 24

    # explicit filterbank: mel points, then per-(mel, bin) triangle loop
    def to_mel(f):
        return 2595.0 * math.log10(1.0 + f / 700.0)

    def from_mel(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    m_lo, m_hi = to_mel(0.0), to_mel(RATE / 2.0)
    pts = [from_mel(m_lo + (m_hi - m_lo) * k / (N_MELS + 1))
           for k in range(N_MELS + 2)]
    n_bins = FRAME // 2 + 1
    bin_hz = [b * RATE / FRAME for b in range(n_bins)]
    fb = [[0.0] * n_bins for _ in range(N_MELS)]
    for m in range(N_MELS):
        lo, mid, hi = pts[m], pts[m + 1], pts[m + 2]
        for b in range(n_bins):
            up = (bin_hz[b] - lo) / max(mid - lo, 1e-12)
            down = (hi - bin_hz[b]) / max(hi - mid, 1e-12)
            fb[m][b] = min(max(min(up, down), 0.0), 1e18)
    fb = np.array(fb)
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(FRAME) / FRAME)

    out_mean, out_frames, ids = [], [], sorted(int(i) for i in docs["doc_id"])
    for i in ids:
        n = 800 + (i % 5) * 160
        f0 = 200.0 + (i % 16) * 450.0
        t = np.arange(n)
        s = np.round(8000.0 * np.sin(2 * np.pi * f0 * t / 16000.0)
                     ).astype(np.int16).astype(np.float64)
        frames = []
        start = 0
        while start + FRAME <= n:
            fr = s[start:start + FRAME] * win
            p = np.abs(np.fft.rfft(fr)) ** 2
            frames.append(np.log(fb @ p + 1e-10))
            start += HOP
        lm = np.array(frames)
        pooled = np.concatenate([lm.mean(axis=0), lm.std(axis=0)]
                                ).astype(np.float32)
        out_mean.append(round(float(pooled.astype(np.float64).mean()), 6))
        out_frames.append(len(frames))
    return pd.DataFrame({
        "doc_id": ids,
        "logmel_mean": np.array(out_mean, dtype=np.float64),
        "n_frames": np.array(out_frames, dtype=np.int32),
    })

def main(sf_dirs: list[str]) -> None:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    acc: dict[str, list[pd.DataFrame]] = {}
    for sf_dir in sf_dirs:
        docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
        emb = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
        fp_docs = int((docs.doc_id * docs.n_chars).sum())
        fp_emb = int((emb.vec_id * emb.label).sum())
        print(f"{sf_dir}: fp_docs={fp_docs} fp_emb={fp_emb}")
        for name, df, fp in [
            ("langid_docs", langid_fixture(docs), fp_docs),
            ("perplexity_docs", perplexity_fixture(docs), fp_docs),
            ("lm_trained_ppl_docs", lm_trained_fixture(docs), fp_docs),
            ("minhash_neardup_docs", minhash_fixture(docs), fp_docs),
            ("minhash_verified_docs", minhash_verified_fixture(docs), fp_docs),
            # threshold matches the catalog query (0.985 discriminates on
            # this corpus: candidate-pair Jaccard spans 0.92-1.0, so the
            # exact verify demonstrably prunes ~half the LSH candidates)
            ("ngram_jaccard_neardup_docs",
             ngram_jaccard_fixture(docs, threshold=0.985), fp_docs),
            ("bpe_train_merges", bpe_train_fixture(docs), fp_docs),
            ("bpe_apply_docs", bpe_apply_fixture(docs), fp_docs),
            ("unigram_train_vocab", unigram_train_fixture(docs), fp_docs),
            ("unigram_apply_docs", unigram_apply_fixture(docs), fp_docs),
            ("wordpiece_train_vocab", wordpiece_train_fixture(docs), fp_docs),
            ("wordpiece_apply_docs", wordpiece_apply_fixture(docs), fp_docs),
            ("wordpiece_pack_docs", wordpiece_pack_fixture(docs), fp_docs),
            ("cc_cluster_docs", cc_cluster_fixture(docs), fp_docs),
            ("incremental_neardup_docs", incremental_neardup_fixture(docs), fp_docs),
            ("zlib_ratio_docs", zlib_ratio_fixture(docs), fp_docs),
            ("substr_remove_docs", substr_remove_fixture(docs), fp_docs),
            ("winnow_fingerprint_docs", winnow_fixture(docs), fp_docs),
            ("fingerprint_overlap_docs", fingerprint_overlap_fixture(docs), fp_docs),
            ("simhash_neardup_docs", simhash_fixture(docs), fp_docs),
            ("embedding_neardup", embedding_neardup_fixture(emb), fp_emb),
            ("lsh_ann_topk", lsh_ann_fixture(emb), fp_emb),
            ("ivf_ann_topk", ivf_ann_fixture(emb), fp_emb),
            ("fasttext_langid_docs", fasttext_fixture(docs), fp_docs),
            ("logreg_docs", logreg_fixture(docs), fp_docs),
            ("dsir_docs", dsir_fixture(docs), fp_docs),
            ("kn_ppl_docs", kn_ppl_fixture(docs), fp_docs),
            ("semdedup_embeddings", semdedup_fixture(emb), fp_emb),
            ("kmeans_embeddings", kmeans_fixture(emb), fp_emb),
            ("pca_embeddings", pca_fixture(emb), fp_emb),
            ("pq_embeddings", pq_fixture(emb), fp_emb),
            ("media_dhash_docs", media_dhash_fixture(docs), fp_docs),
            ("media_video_docs", media_video_fixture(docs), fp_docs),
            ("media_logmel_docs", media_logmel_fixture(docs), fp_docs),
        ]:
            df.insert(0, "fp", np.int64(fp))
            acc.setdefault(name, []).append(df)
            print(f"  {name}: {len(df)} rows")
    for name, parts in acc.items():
        out = pd.concat(parts, ignore_index=True)
        out.to_parquet(os.path.join(FIXTURE_DIR, f"{name}.parquet"), index=False)
        print(f"wrote fixtures/{name}.parquet ({len(out)} rows)")


if __name__ == "__main__":
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1",
    ]
    main(dirs)
