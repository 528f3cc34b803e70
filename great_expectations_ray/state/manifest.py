"""Per-partition checkpoint manifests — resumable, auditable runs.

The reference stores suite results idempotently keyed by
``ValidationResultIdentifier(suite, run_id, batch_id)``
(``core/validation_definition.py:306-317``, ``data_context/types/
resource_identifiers.py:102-123``) but has no sub-run resume.  Our engine
adds partition granularity: each input-file group gets a manifest
``{partition_id, input_fingerprint, status, counts, rollup}`` written
ATOMICALLY (tmp + rename) next to its output; a restarted run skips
partitions whose manifest is complete AND whose input fingerprint still
matches (BASELINE.md resumability criterion).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Optional


def input_fingerprint(files: list[str]) -> str:
    """md5 over sorted (name, size) pairs — cheap, catches swapped/changed
    inputs without reading data."""
    h = hashlib.md5()
    for f in sorted(files):
        try:
            size = os.path.getsize(f)
        except OSError:
            size = -1
        h.update(f"{os.path.basename(f)}:{size};".encode())
    return h.hexdigest()


@dataclass
class RunIdentifier:
    """GX-shaped run identity (``RunIdentifier(run_name, run_time)``)."""

    run_name: str
    run_time: float = field(default_factory=time.time)

    def to_json_dict(self) -> dict[str, Any]:
        return {"run_name": self.run_name, "run_time": self.run_time}


def _manifest_dir(output_root: str) -> str:
    return os.path.join(output_root, "manifests")


def manifest_path(output_root: str, partition_id: str) -> str:
    return os.path.join(_manifest_dir(output_root), f"{partition_id}.json")


def load_manifest(output_root: str, partition_id: str) -> Optional[dict[str, Any]]:
    p = manifest_path(output_root, partition_id)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None  # torn write never happens (atomic rename), but be safe


def write_manifest(output_root: str, partition_id: str, payload: dict[str, Any]) -> str:
    os.makedirs(_manifest_dir(output_root), exist_ok=True)
    p = manifest_path(output_root, partition_id)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, p)  # atomic: a manifest either exists complete or not at all
    return p


def is_partition_complete(output_root: str, partition_id: str, fingerprint: str) -> bool:
    m = load_manifest(output_root, partition_id)
    return bool(m and m.get("status") == "complete" and m.get("input_fingerprint") == fingerprint)
