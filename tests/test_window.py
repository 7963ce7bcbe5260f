"""Window operator tests vs pandas ground truth."""

import numpy as np
import pandas as pd
import ray.data as rd

from fluent_plugin_geoip_ray.stages.window import (
    session_windows,
    sliding_window_counts,
    tumbling_window,
)


def events_df(n=2000, seed=5):
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + np.sort(rng.integers(0, 86_400_000_000, size=n)).astype("timedelta64[us]")
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 20, size=n),
            "ts": ts,
            "value": np.round(rng.random(n) * 10, 2),
        }
    )


def test_tumbling_window_counts():
    df = events_df()
    out = tumbling_window(
        rd.from_pandas(df), size_sec=3600,
        aggs=[("value", "count", "n"), ("value", "sum", "s")],
    ).to_pandas().set_index("window_start").sort_index()
    epoch = df["ts"].astype("int64")
    exp = df.groupby((epoch // 3_600_000_000) * 3600).agg(
        n=("value", "size"), s=("value", "sum")
    )
    assert (out["n"] == exp["n"]).all()
    assert np.allclose(out["s"], exp["s"])


def test_sliding_window_each_event_in_k_windows():
    df = events_df(200)
    out = sliding_window_counts(
        rd.from_pandas(df), size_sec=3600, step_sec=900
    ).to_pandas()
    assert out["n"].sum() == len(df) * 4  # size/step = 4 windows per event
    # spot-check one event: it appears in exactly the windows covering it
    t = df["ts"].astype("int64").iloc[0] // 1_000_000
    covering = out[(out["window_start"] <= t) & (t < out["window_start"] + 3600)]
    assert len(covering) >= 4


def test_session_windows_vs_pandas():
    df = events_df(800)
    out = session_windows(
        rd.from_pandas(df), key="user_id", gap_sec=1800, order_tiebreak="event_id"
    ).to_pandas()

    # pandas ground truth: lag + cumsum per user
    exp_rows = []
    for uid, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        gaps = g["ts"].diff() > pd.Timedelta(seconds=1800)
        sess = gaps.cumsum() + 1
        agg = g.groupby(sess).agg(
            n_events=("ts", "size"), ts_min=("ts", "min"), ts_max=("ts", "max")
        )
        for sidx, row in agg.iterrows():
            exp_rows.append((uid, sidx, row["n_events"], row["ts_min"], row["ts_max"]))
    exp = pd.DataFrame(
        exp_rows, columns=["user_id", "session_idx", "n_events", "ts_min", "ts_max"]
    ).sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    got = out.sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["n_events"].to_numpy() == exp["n_events"].to_numpy()).all()
    assert (got["ts_min"].to_numpy() == exp["ts_min"].to_numpy()).all()
    assert (got["ts_max"].to_numpy() == exp["ts_max"].to_numpy()).all()


def test_session_scan_matches_groups_impl():
    """The sorted-scan sessionization must equal the per-group reference
    implementation row-for-row (including session_idx numbering)."""
    df = events_df(1500)
    a = (
        session_windows(rd.from_pandas(df), key="user_id", gap_sec=1800,
                        order_tiebreak="event_id", impl="scan")
        .to_pandas().sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    )
    b = (
        session_windows(rd.from_pandas(df), key="user_id", gap_sec=1800,
                        order_tiebreak="event_id", impl="groups")
        .to_pandas().sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a[b.columns], b)


def test_session_scan_duplicate_key_ts_across_blocks():
    """Duplicate (key, ts) rows split across blocks must not collide in the
    scan's block-identity map (tiebreak column disambiguates)."""
    import pandas as pd

    n = 600
    df = pd.DataFrame({
        "user_id": np.repeat([1, 2, 3], n // 3),
        "ts": pd.to_datetime("2026-01-01")  # EVERY row same timestamp
              + pd.to_timedelta(np.zeros(n), unit="s"),
        "event_id": np.arange(n),
    })
    out = (
        session_windows(rd.from_pandas(df).repartition(10), key="user_id",
                        gap_sec=60, order_tiebreak="event_id")
        .to_pandas().sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    )
    # all rows of a user share one session (gap 0 <= 60s)
    assert len(out) == 3
    assert (out["n_events"] == n // 3).all()
