"""Betweenness centrality (A13) vs exact Brandes oracle."""

import numpy as np
import pytest

from flashray import betweenness, fixtures
from flashray.build import build_graph_from_arrays

import oracles


def _run_exact(src, dst, tmp_path, name):
    g = build_graph_from_arrays(
        np.asarray(src, dtype=np.int64), np.asarray(dst, dtype=np.int64),
        str(tmp_path / name), num_partitions=4,
    )
    df = betweenness.betweenness(
        g, scratch_dir=str(tmp_path / (name + "_bc")), sources=None,
        normalize=False,
    )
    got = dict(zip(df["vertex_id"].astype(int), df["value"]))
    want = oracles.betweenness_brandes(np.asarray(src), np.asarray(dst))
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])


def test_bc_path(tmp_path):
    # directed path: middle vertices carry all pass-through paths
    _run_exact([0, 1, 2, 3], [1, 2, 3, 4], tmp_path, "p5")


def test_bc_star_undirected(tmp_path):
    src, dst = fixtures.star_edges(6)
    _run_exact(src, dst, tmp_path, "star")


def test_bc_er_random(tmp_path):
    rng = np.random.default_rng(23)
    n = 40
    adj = (rng.random((n, n)) < 0.08) & ~np.eye(n, dtype=bool)
    src, dst = np.nonzero(adj)
    _run_exact(src, dst, tmp_path, "er")


def test_bc_sampled_deterministic(tmp_path):
    src, dst = fixtures.er_edges(50, 0.08, seed=3)
    g = build_graph_from_arrays(src, dst, str(tmp_path / "s"), num_partitions=4)
    a = betweenness.betweenness(g, scratch_dir=str(tmp_path / "bc1"), sources=8)
    b = betweenness.betweenness(g, scratch_dir=str(tmp_path / "bc1"), sources=8)
    assert (a["value"].values == b["value"].values).all()


def test_bc_batched_exact(tmp_path):
    """Batched multi-source Brandes (vector-valued messages) vs the exact
    oracle: all 40 sources in batches of 16 — per-source math must be
    identical to sequential mode."""
    rng = np.random.default_rng(29)
    n = 40
    adj = (rng.random((n, n)) < 0.1) & ~np.eye(n, dtype=bool)
    src, dst = np.nonzero(adj)
    g = build_graph_from_arrays(
        np.asarray(src, dtype=np.int64), np.asarray(dst, dtype=np.int64),
        str(tmp_path / "bx"), num_partitions=4,
    )
    df = betweenness.betweenness(
        g, scratch_dir=str(tmp_path / "bx_bc"), sources=None,
        normalize=False, batch=16,
    )
    got = dict(zip(df["vertex_id"].astype(int), df["value"]))
    want = oracles.betweenness_brandes(np.asarray(src), np.asarray(dst))
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])


def test_bc_batched_matches_sequential_sampled(tmp_path):
    src, dst = fixtures.er_edges(50, 0.08, seed=7)
    g = build_graph_from_arrays(src, dst, str(tmp_path / "bs"), num_partitions=4)
    a = betweenness.betweenness(g, scratch_dir=str(tmp_path / "bs_bc"), sources=8)
    b = betweenness.betweenness(
        g, scratch_dir=str(tmp_path / "bs_bc"), sources=8, batch=8
    )
    np.testing.assert_allclose(a["value"].values, b["value"].values, rtol=1e-9)
