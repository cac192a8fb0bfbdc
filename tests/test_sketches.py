"""HyperLogLog distinct sketches + deterministic bottom-k sampling."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from flashray.datapipe import sketches


def test_hll_accuracy_large():
    n = 5000
    df = pd.DataFrame({"v": [f"item-{i}" for i in range(n)]})
    est = sketches.approx_distinct(rd.from_pandas(df), "v", p=12)
    # p=12 -> ~1.6% rel std error; 5 sigma bound
    assert abs(est - n) / n < 0.08


def test_hll_small_range_linear_counting():
    n = 100
    df = pd.DataFrame({"v": [f"x{i}" for i in range(n)] * 3})  # dups collapse
    est = sketches.approx_distinct(rd.from_pandas(df), "v", p=12)
    assert abs(est - n) / n < 0.05


def test_hll_partition_invariant():
    df = pd.DataFrame({"v": [f"k{i % 700}" for i in range(5000)]})
    ds = rd.from_pandas(df)
    a = sketches.approx_distinct(ds.repartition(1), "v", p=12)
    b = sketches.approx_distinct(ds.repartition(13), "v", p=12)
    assert a == b  # bit-identical: registers max-merge associatively


def test_hll_words():
    texts = ["the quick brown fox", "the lazy dog", "quick dog"]
    df = pd.DataFrame({"text": texts})
    est = sketches.approx_distinct_words(rd.from_pandas(df), "text", p=12)
    # 7 distinct words, linear-counting regime: near exact
    assert abs(est - 7) < 1


def test_hll_by_key():
    rows = []
    expected = {}
    for k, n in [("a", 10), ("b", 250), ("c", 1)]:
        expected[k] = n
        for i in range(n):
            rows.append({"k": k, "v": f"{k}-{i}"})
            rows.append({"k": k, "v": f"{k}-{i}"})  # dup
    df = pd.DataFrame(rows)
    out = (
        sketches.approx_distinct_by_key(rd.from_pandas(df).repartition(5), "k", "v", p=12)
        .to_pandas()
        .set_index("k")["approx_distinct"]
    )
    for k, n in expected.items():
        assert abs(out[k] - n) / n < 0.05, (k, out[k], n)


def test_bottomk_sample():
    df = pd.DataFrame({"id": np.arange(1000), "payload": np.arange(1000) * 2})
    ds = rd.from_pandas(df)
    s1 = sketches.bottomk_sample(ds.repartition(3), 50, "id").to_pandas()
    s2 = sketches.bottomk_sample(ds.repartition(11), 50, "id").to_pandas()
    assert len(s1) == 50
    # partition-invariant and deterministic
    assert sorted(s1["id"]) == sorted(s2["id"])
    # subset of the input, payload intact
    assert (s1["payload"] == s1["id"] * 2).all()
    # a different salt draws a different (but equally deterministic) sample
    s3 = sketches.bottomk_sample(ds, 50, "id", salt="other").to_pandas()
    assert sorted(s3["id"]) != sorted(s1["id"])
