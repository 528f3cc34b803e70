"""Raw-actor stateful streaming: sharded keyed state over an ordered log."""

from __future__ import annotations

import pandas as pd

from great_expectations_ray.stages.streaming_state import KeyedStreamState


def test_keyed_stream_state_matches_pandas():
    import ray.data as rd

    ds = rd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["user_id", "value", "ts"])
    state = KeyedStreamState(n_shards=3)
    n = state.consume(ds, key_col="user_id", value_col="value", order_by="ts",
                      batch_size=256)
    assert n == 1000
    snap = state.snapshot()

    df = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    exp_counts = df.groupby("user_id").size().to_dict()
    exp_sums = df.groupby("user_id").value.sum().to_dict()
    assert snap["counts"] == exp_counts
    for k, v in exp_sums.items():
        assert abs(snap["sums"][k] - v) < 1e-6
    # first_seen respects event-time order: earliest ts per key
    first = df.sort_values("ts").groupby("user_id").ts.first()
    for k, ts in first.items():
        assert snap["first_seen"][k] == ts
