"""Independent pandas/re reference implementation of the quality-filter
semantics (BASELINE.md: "pytest oracle (pandas implementation of reference
semantics)").  Deliberately avoids pyarrow kernels: python ``re``, python
loops, pandas string ops — so agreement with the Ray pipeline is evidence,
not tautology.  Only the trained LM table is shared (it IS the model)."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

SCRUB_PATTERNS = [
    (re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"), "<EMAIL>"),
    (re.compile(r"AKIA[0-9A-Z]{16}"), "<AWS_KEY>"),
    (re.compile(r"Bearer [A-Za-z0-9._~+/-]{16,}"), "Bearer <TOKEN>"),
    (re.compile(r"-----BEGIN [A-Z ]*PRIVATE KEY-----"), "<PRIVATE_KEY_HEADER>"),
]

_ALNUM = re.compile(r"[A-Za-z0-9]")


def oracle_stats(content: str) -> dict:
    n_chars = len(content)
    lines = content.split("\n")
    max_line = max((len(ln) for ln in lines), default=0)
    alnum = len(_ALNUM.findall(content))
    return {
        "n_chars": n_chars,
        "max_line_len": max_line,
        "alnum_ratio": alnum / max(n_chars, 1),
    }


def oracle_perplexity(model: np.ndarray, content: str, cap: int = 65536) -> float:
    b = content.encode("utf-8", "replace")[:cap]
    if len(b) == 0:
        return 1e9
    if len(b) < 3:
        return 256.0
    total = 0.0
    for i in range(2, len(b)):
        # hashed-context bucket, pure-python mirror of ctx_bucket (int32-safe
        # multiply-xor-fold; identical arithmetic by construction)
        raw = (b[i - 2] << 8) | b[i - 1]
        bucket = ((raw * 9973) ^ (raw >> 7)) % 8192
        total += float(model[bucket, b[i]])
    h = -total / (len(b) - 2)
    return 2.0**h


def oracle_keep(row_stats: dict, ppl: float, content) -> bool:
    if content is None:
        return False
    if not (1 <= row_stats["n_chars"] <= 2_000_000):
        return False
    if row_stats["max_line_len"] > 10_000:
        return False
    if not (0.25 <= row_stats["alnum_ratio"] <= 1.0):
        return False
    if not (0.0 <= ppl <= 5_000.0):
        return False
    return True


def oracle_scrub(content: str) -> str:
    out = content
    for pat, repl in SCRUB_PATTERNS:
        out = pat.sub(repl, out)
    return out


def run_oracle(df: pd.DataFrame, model: np.ndarray) -> pd.DataFrame:
    keeps, shas = [], []
    for content in df["content"]:
        c = content if content is not None else ""
        st = oracle_stats(c)
        ppl = oracle_perplexity(model, c)
        keeps.append(oracle_keep(st, ppl, content))
        scrubbed = oracle_scrub(c)
        shas.append(hashlib.sha256(scrubbed.encode("utf-8", "surrogatepass")).hexdigest())
    out = df[["repo", "path", "commit"]].copy()
    out["keep_expected"] = keeps
    out["scrubbed_sha256_expected"] = shas
    return out
