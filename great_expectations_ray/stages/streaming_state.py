"""Stateful streaming over an ordered log — the raw-actor tier.

Most operators in this engine are Dataset transforms; this module is the
documented escape hatch for semantics the Dataset API genuinely cannot
express (SURVEY §2 custom-operator tier (c)): a SHARED MUTABLE INDEX updated
in event-time order — e.g. first-seen deduplication across an unbounded
stream, or running per-key aggregates consumed incrementally.

Design: N ``@ray.remote`` state-shard actors, each owning the keys with
``hash(key) % N == shard``.  The driver streams the log in ts order via
``iter_batches`` and routes each batch's rows to shards; actors apply updates
in arrival order and answer queries.  Partitioning assumption (stated per the
task's custom-operator rule): correctness of *per-key* state needs only
per-key ordered delivery, which the single driver cursor guarantees; cross-
key global ordering is NOT guaranteed between shards.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _make_shard_actor():
    import ray

    @ray.remote(num_cpus=0.5)
    class StateShard:
        """Owns running state for a subset of keys."""

        def __init__(self):
            self.counts: dict[Any, int] = {}
            self.sums: dict[Any, float] = {}
            self.first_seen: dict[Any, Any] = {}

        def update(self, keys: list, values: list, markers: list) -> int:
            new_keys = 0
            for k, v, m in zip(keys, values, markers):
                if k not in self.counts:
                    self.counts[k] = 0
                    self.sums[k] = 0.0
                    self.first_seen[k] = m
                    new_keys += 1
                self.counts[k] += 1
                self.sums[k] += float(v)
            return new_keys

        def snapshot(self) -> dict:
            return {
                "counts": dict(self.counts),
                "sums": dict(self.sums),
                "first_seen": dict(self.first_seen),
            }

    return StateShard


class KeyedStreamState:
    """Driver-side handle: routes an ordered event stream into state shards.

    Usage::

        state = KeyedStreamState(n_shards=4)
        state.consume(ds, key_col="user_id", value_col="value",
                      order_by="ts")            # one ordered pass
        snap = state.snapshot()                  # merged running aggregates
    """

    def __init__(self, n_shards: int = 4):
        import ray

        Shard = _make_shard_actor()
        self.n = n_shards
        self.shards = [Shard.remote() for _ in range(n_shards)]
        self._ray = ray

    def consume(self, ds, *, key_col: str, value_col: str, order_by: str,
                batch_size: int = 4096) -> int:
        """Stream the dataset in ``order_by`` order through the shards.
        Returns total rows consumed.  The sort is the only wide op; the
        stateful application is strictly sequential per shard."""
        total = 0
        ordered = ds.select_columns([key_col, value_col, order_by]).sort(order_by)
        pending: list = []
        for batch in ordered.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
            keys = np.asarray(batch.column(key_col))
            vals = np.asarray(pc.cast(batch.column(value_col), pa.float64()))
            marks = batch.column(order_by).to_pylist()
            shard_of = np.asarray(
                [hash(k) % self.n for k in keys.tolist()], dtype=np.int64
            )
            refs = []
            for s in range(self.n):
                m = shard_of == s
                if m.any():
                    refs.append(self.shards[s].update.remote(
                        keys[m].tolist(), vals[m].tolist(),
                        [marks[i] for i in np.nonzero(m)[0]],
                    ))
            # barrier per batch keeps per-key arrival order == ts order
            self._ray.get(refs)
            total += len(keys)
        return total

    def snapshot(self) -> dict:
        merged = {"counts": {}, "sums": {}, "first_seen": {}}
        for snap in self._ray.get([s.snapshot.remote() for s in self.shards]):
            for field in merged:
                merged[field].update(snap[field])
        return merged
