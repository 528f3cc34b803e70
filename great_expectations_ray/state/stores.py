"""Stores — filesystem-backed suite & validation-result persistence.

Mirror of the reference's store layer (``data_context/store/
expectations_store.py``, ``validation_results_store.py`` over
``tuple_store_backend.py``): suites keyed by name; results keyed by the
``ValidationResultIdentifier`` triple (suite, run_name+run_time, batch) —
``data_context/types/resource_identifiers.py:102-123``.  Everything is plain
JSON files under a root directory (the filesystem tuple-store backend); cloud
object stores mount the same layout via their fuse/URI equivalents.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

from great_expectations_ray.core.suite import ExpectationSuite


class ExpectationsStore:
    def __init__(self, root: str):
        self.root = os.path.join(root, "expectations")
        os.makedirs(self.root, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.json")

    def save(self, suite: ExpectationSuite) -> str:
        p = self._path(suite.name)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            f.write(suite.to_json())
        os.replace(tmp, p)
        return p

    def load(self, name: str) -> ExpectationSuite:
        with open(self._path(name)) as f:
            return ExpectationSuite.from_json(f.read())

    def list_suites(self) -> list[str]:
        return sorted(
            f[: -len(".json")] for f in os.listdir(self.root) if f.endswith(".json")
        )

    def delete(self, name: str) -> None:
        os.remove(self._path(name))


class ValidationResultsStore:
    """Results keyed by (suite_name, run_name, run_time, batch_id)."""

    def __init__(self, root: str):
        self.root = os.path.join(root, "validations")
        os.makedirs(self.root, exist_ok=True)

    def _path(self, suite_name: str, run_name: str, run_time: float, batch_id: str) -> str:
        d = os.path.join(self.root, suite_name, f"{run_name}-{run_time:.0f}")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"{batch_id}.json")

    def save(self, result, *, run_name: str, run_time: float, batch_id: str) -> str:
        payload = result.to_json_dict() if hasattr(result, "to_json_dict") else result
        p = self._path(payload.get("suite_name", "suite"), run_name, run_time, batch_id)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True, default=str)
        os.replace(tmp, p)
        return p

    def load(self, suite_name: str, run_name: str, run_time: float, batch_id: str) -> dict[str, Any]:
        with open(self._path(suite_name, run_name, run_time, batch_id)) as f:
            return json.load(f)

    def list_keys(self) -> list[tuple[str, str, str]]:
        out = []
        for suite in sorted(os.listdir(self.root)):
            sdir = os.path.join(self.root, suite)
            for run in sorted(os.listdir(sdir)):
                for fn in sorted(os.listdir(os.path.join(sdir, run))):
                    if fn.endswith(".json"):
                        out.append((suite, run, fn[: -len(".json")]))
        return out
