"""Windowed aggregates over the events table vs DuckDB / pandas oracles."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from flashray.datapipe import windows

EVENTS = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def events_ds():
    return rd.read_parquet(EVENTS)


def test_tumbling_vs_duckdb(events_ds):
    got = windows.tumbling_window(events_ds, window_sec=3600).to_pandas()
    want = duckdb.sql(
        f"""
        SELECT user_id,
               epoch_ms(ts) // 1000 // 3600 * 3600 AS window_start,
               COUNT(*) AS n_events, SUM(value) AS sum_value,
               MIN(value) AS min_value, MAX(value) AS max_value
        FROM read_parquet('{EVENTS}') GROUP BY 1, 2
        """
    ).df()
    keys = ["user_id", "window_start"]
    got = got.sort_values(keys).reset_index(drop=True)
    want = want.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(want)
    for c in keys + ["n_events"]:
        assert (got[c].values == want[c].values).all(), c
    for c in ["sum_value", "min_value", "max_value"]:
        assert np.allclose(got[c], want[c]), c


def test_sliding_brute_force(events_ds):
    W, S = 3600, 900
    got = windows.sliding_window(
        events_ds, window_sec=W, slide_sec=S
    ).to_pandas()
    df = pd.read_parquet(EVENTS)
    ts = df["ts"].astype("datetime64[us]").astype("int64") // 1_000_000
    rows = []
    for shift in range(W // S):
        w = (ts // S - shift) * S
        rows.append(
            pd.DataFrame({"user_id": df["user_id"], "window_start": w, "value": df["value"]})
        )
    exp = pd.concat(rows)
    exp = exp[exp["window_start"] >= 0]
    want = (
        exp.groupby(["user_id", "window_start"])
        .agg(n_events=("value", "size"), sum_value=("value", "sum"))
        .reset_index()
    )
    keys = ["user_id", "window_start"]
    got = got.sort_values(keys).reset_index(drop=True)
    want = want.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["n_events"].values == want["n_events"].values).all()
    assert np.allclose(got["sum_value"], want["sum_value"])


def test_session_windows(events_ds):
    GAP = 1800
    got = windows.session_window(events_ds, gap_sec=GAP).to_pandas()
    df = pd.read_parquet(EVENTS).sort_values(["user_id", "ts"])
    want_rows = []
    for uid, g in df.groupby("user_id"):
        ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy() // 1_000_000
        val = g["value"].to_numpy()
        start = 0
        for i in range(1, len(ts) + 1):
            if i == len(ts) or ts[i] - ts[i - 1] > GAP:
                want_rows.append(
                    (uid, ts[start], ts[i - 1], i - start, val[start:i].sum())
                )
                start = i
    want = pd.DataFrame(
        want_rows,
        columns=["user_id", "session_start", "session_end", "n_events", "sum_value"],
    )
    keys = ["user_id", "session_start"]
    got = got.sort_values(keys).reset_index(drop=True)
    want = want.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(want)
    for c in ["user_id", "session_start", "session_end", "n_events"]:
        assert (got[c].values == want[c].values).all(), c
    assert np.allclose(got["sum_value"], want["sum_value"])
