"""Distributed Lloyd k-means vs an in-memory numpy oracle (sem_kmeans
parity: only k×d centroid state is resident; vectors stream per batch)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from flashray.datapipe import kmeans


def _blobs(n=300, d=8, k=3, seed=11):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 10, size=(k, d))
    pts = np.concatenate(
        [c + rng.normal(0, 0.5, size=(n // k, d)) for c in centers]
    ).astype(np.float32)
    ids = np.arange(len(pts), dtype=np.int64)
    return ids, pts


def _lloyd_oracle(pts, seeds, iters):
    x = pts.astype(np.float64)
    c = seeds.copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        for j in range(len(c)):
            m = a == j
            if m.any():
                c[j] = x[m].mean(axis=0)
    d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    return c, np.argmin(d2, axis=1)


def _ds(ids, pts):
    return rd.from_pandas(
        pd.DataFrame({"vec_id": ids, "embedding": list(pts)})
    )


@pytest.mark.parametrize("init", ["hash", "lowest_ids"])
def test_kmeans_matches_numpy_lloyd(init):
    ids, pts = _blobs()
    ds = _ds(ids, pts)
    cents, info = kmeans.kmeans(
        ds, k=3, max_iters=5, tol=0.0, init=init, batch_size=64
    )
    # replicate the seed rule
    if init == "hash":
        from flashray.ids import _splitmix64

        pri = _splitmix64(ids.astype(np.uint64)) >> np.uint64(1)
        seed_idx = np.argsort(pri, kind="stable")[:3]
    else:
        seed_idx = np.argsort(ids, kind="stable")[:3]
    seeds = pts[seed_idx].astype(np.float64)
    want_c, want_a = _lloyd_oracle(pts, seeds, 5)
    assert np.allclose(cents, want_c, atol=1e-9)
    got = (
        kmeans.kmeans_assign(ds, cents, batch_size=64)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert (got["cluster"].to_numpy() == want_a).all()
    assert info["iterations"] == 5
    assert sum(info["counts"]) == len(ids)


def test_kmeans_converges_and_separates_blobs():
    ids, pts = _blobs()
    # interleave: id i belongs to blob i%3, so lowest_ids seeds one point
    # per blob (Lloyd from arbitrary seeds can legitimately split a blob —
    # a local optimum, not an engine property)
    third = len(ids) // 3
    perm = np.array(
        [(i % 3) * third + i // 3 for i in range(len(ids))], dtype=np.int64
    )
    pts = pts[perm]
    ds = _ds(ids, pts)
    cents, info = kmeans.kmeans(
        ds, k=3, max_iters=50, tol=1e-8, init="lowest_ids", batch_size=64
    )
    assert info["iterations"] < 50  # tol-converged well before the cap
    a = (
        kmeans.kmeans_assign(ds, cents)
        .to_pandas()
        .sort_values("vec_id")["cluster"]
        .to_numpy()
    )
    # blob of row i is i%3: every blob maps to exactly one cluster
    for b in range(3):
        blk = a[np.arange(len(ids)) % 3 == b]
        assert (blk == blk[0]).all()
    assert len({a[0], a[1], a[2]}) == 3


def test_kmeans_empty_cluster_keeps_centroid():
    # k=3 seeds but all points identical: clusters 1,2 go empty and must
    # keep their seed centroids (no NaNs)
    pts = np.ones((20, 4), dtype=np.float32)
    ids = np.arange(20, dtype=np.int64)
    cents, info = kmeans.kmeans(
        _ds(ids, pts), k=3, max_iters=3, init="lowest_ids", batch_size=7
    )
    assert np.isfinite(cents).all()
    assert sum(info["counts"]) == 20
