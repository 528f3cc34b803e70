"""Moving-window aggregates (functions/window_rank.py)."""


def test_moving_window_aggregates_match_pandas_rolling():
    """moving_sum / moving_avg == pandas rolling over each partition."""
    import numpy as np
    import pandas as pd
    import ray

    from great_expectations_ray.functions.window_rank import windowed_rank

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "k": [f"p{i % 3}" for i in range(60)],
        "o": np.arange(60),
        "v": rng.integers(0, 1000, size=60),
    })
    ds = ray.data.from_pandas(df).repartition(5)
    out = (windowed_rank(ds, partition_by="k", order_by="o", value_col="v",
                         outputs=("moving_sum", "moving_avg"), frame_rows=3)
           .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
    ref = df.sort_values(["k", "o"]).reset_index(drop=True)
    roll = ref.groupby("k")["v"].rolling(4, min_periods=1)
    exp_sum = roll.sum().reset_index(drop=True)
    exp_avg = roll.mean().reset_index(drop=True)
    assert np.allclose(out["moving_sum"], exp_sum)
    assert np.allclose(out["moving_avg"], exp_avg)


def test_moving_window_requires_value_col():
    import pytest
    import ray

    from great_expectations_ray.functions.window_rank import windowed_rank

    ds = ray.data.from_items([{"k": 1, "o": 1}])
    with pytest.raises(ValueError):
        windowed_rank(ds, partition_by="k", order_by="o",
                      outputs=("moving_avg",))
