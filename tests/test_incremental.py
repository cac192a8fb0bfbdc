"""Incremental ingest (build.add_edges) ≡ full rebuild over the union."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from flashray import algorithms
from flashray.build import Graph, add_edges, build_graph
from flashray.fixtures import edges_table


def _edges_ds(src, dst, weight=None):
    return rd.from_arrow(edges_table(np.asarray(src), np.asarray(dst), weight))


def _snapshot(g: Graph):
    e = (
        g.edges_dataset()
        .to_pandas()
        .sort_values(["src", "dst", "etype"])
        .reset_index(drop=True)
    )
    v = (
        g.vertices_dataset()
        .to_pandas()
        .sort_values("vertex_id")
        .reset_index(drop=True)
    )
    return e, v


@pytest.mark.parametrize("symmetrize", [False, True])
def test_add_edges_matches_full_rebuild(tmp_path, symmetrize):
    rng = np.random.default_rng(17)
    src = rng.integers(0, 60, 400)
    dst = rng.integers(0, 60, 400)
    half = 250  # overlapping keys across the two batches exercise the
    # weight-sum merge, not just inserts

    inc = build_graph(
        _edges_ds(src[:half], dst[:half]),
        str(tmp_path / "inc"),
        num_partitions=4,
        symmetrize=symmetrize,
    )
    inc = add_edges(inc, _edges_ds(src[half:], dst[half:]))

    full = build_graph(
        _edges_ds(src, dst),
        str(tmp_path / "full"),
        num_partitions=4,
        symmetrize=symmetrize,
    )

    ei, vi = _snapshot(inc)
    ef, vf = _snapshot(full)
    pd.testing.assert_frame_equal(ei, ef)
    pd.testing.assert_frame_equal(vi, vf)
    assert inc.meta.num_edges == full.meta.num_edges
    assert inc.meta.num_vertices == full.meta.num_vertices
    assert inc.meta.symmetrized == full.meta.symmetrized

    # and the engine agrees end-to-end
    a = algorithms.pagerank(inc, eps=1e-10)
    b = algorithms.pagerank(full, eps=1e-10)
    assert np.allclose(
        a.sort_values("vertex_id")["value"].to_numpy(),
        b.sort_values("vertex_id")["value"].to_numpy(),
        atol=1e-12,
    )


def test_add_edges_new_vertices_and_empty(tmp_path):
    g = build_graph(
        _edges_ds([1, 2], [2, 3]), str(tmp_path / "g"), num_partitions=4
    )
    n0 = g.meta.num_vertices
    g = add_edges(g, _edges_ds([], []))
    assert g.meta.num_vertices == n0
    g = add_edges(g, _edges_ds([100, 101], [102, 1]))
    assert g.meta.num_vertices == n0 + 3  # 100, 101, 102 new; 1 existing
    assert g.meta.num_edges == 4
    deg = g.vertices_dataset().to_pandas().set_index("vertex_id")
    assert int(deg.loc[1, "out_degree"]) == 1
    assert int(deg.loc[1, "in_degree"]) == 1


def test_add_edges_skew_fallback_rebuilds(tmp_path):
    # low threshold: the increment turns vertex 0 into a split hub
    g = build_graph(
        _edges_ds([0, 0, 1], [1, 2, 2]),
        str(tmp_path / "s"),
        num_partitions=4,
        skew_threshold=4,
    )
    assert g.meta.split_vertices == []
    hub_dst = np.arange(10, 18)
    g = add_edges(g, _edges_ds(np.zeros(8, dtype=np.int64), hub_dst))
    assert 0 in g.meta.split_vertices  # full rebuild re-detected the hub
    full = build_graph(
        _edges_ds([0, 0, 1] + [0] * 8, [1, 2, 2] + hub_dst.tolist()),
        str(tmp_path / "sf"),
        num_partitions=4,
        skew_threshold=4,
    )
    ei, vi = _snapshot(g)
    ef, vf = _snapshot(full)
    pd.testing.assert_frame_equal(ei, ef)
    pd.testing.assert_frame_equal(vi, vf)


def test_pagerank_warm_start_after_ingest(tmp_path):
    """Warm-starting PageRank from the pre-ingest converged scores reaches
    the SAME fixed point as a cold run on the updated graph — in fewer
    supersteps (the incremental-analytics path after add_edges)."""
    rng = np.random.default_rng(23)
    n = 300
    src = rng.integers(0, n, size=1500).astype(np.int64)
    dst = rng.integers(0, n, size=1500).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    half = len(src) * 9 // 10
    g = build_graph(
        _edges_ds(src[:half], dst[:half]), str(tmp_path / "inc"),
        num_partitions=4,
    )
    prior = algorithms.pagerank(g, eps=1e-10)
    g = add_edges(g, _edges_ds(src[half:], dst[half:]))

    cold = algorithms.pagerank(g, eps=1e-10)
    warm = algorithms.pagerank(g, eps=1e-10, warm_start=prior)
    c = cold.sort_values("vertex_id").reset_index(drop=True)
    w = warm.sort_values("vertex_id").reset_index(drop=True)
    assert (c["vertex_id"] == w["vertex_id"]).all()
    assert np.allclose(c["value"], w["value"], atol=1e-7)
    # the warm run must actually converge faster on a 10% edge delta
    assert len(warm.attrs["lineage"]) < len(cold.attrs["lineage"])


def test_pagerank_warm_start_new_vertices_default(tmp_path):
    """Vertices absent from the prior (newly ingested) start at 1/N and
    still converge to the cold fixed point."""
    g = build_graph(
        _edges_ds([0, 1, 2], [1, 2, 0]), str(tmp_path / "nv"),
        num_partitions=2,
    )
    prior = algorithms.pagerank(g, eps=1e-12)
    g = add_edges(g, _edges_ds([2, 3], [3, 0]))
    cold = algorithms.pagerank(g, eps=1e-12)
    warm = algorithms.pagerank(g, eps=1e-12, warm_start=prior)
    c = cold.sort_values("vertex_id")["value"].to_numpy()
    w = warm.sort_values("vertex_id")["value"].to_numpy()
    assert np.allclose(c, w, atol=1e-9)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        algorithms.pagerank(g, mode="push", warm_start=prior)


def test_wcc_warm_start_after_ingest(tmp_path):
    """Warm-starting WCC from the pre-ingest converged labels reaches the
    SAME components as a cold run on the updated graph — in no more (and
    on this fixture strictly fewer) supersteps. Fixture: a long path graph
    split into segments; the withheld bridge edges merge the segments, so
    a cold run needs O(path length) min-flood rounds while the warm run
    only floods across the new bridges."""
    n = 64
    src = np.arange(n - 1, dtype=np.int64)
    dst = src + 1
    bridge = (src + 1) % 8 == 0  # every 8th edge withheld: 8 segments
    g = build_graph(
        _edges_ds(src[~bridge], dst[~bridge]), str(tmp_path / "wccinc"),
        num_partitions=4, symmetrize=True,
    )
    prior = algorithms.wcc(g)
    assert prior["value"].nunique() == 8
    g = add_edges(g, _edges_ds(src[bridge], dst[bridge]))

    cold = algorithms.wcc(g)
    warm = algorithms.wcc(g, warm_start=prior)
    c = cold.sort_values("vertex_id").reset_index(drop=True)
    w = warm.sort_values("vertex_id").reset_index(drop=True)
    assert (c["vertex_id"] == w["vertex_id"]).all()
    assert (c["value"] == w["value"]).all()
    assert (w["value"] == 0).all()  # one merged component, min id 0
    assert len(w.attrs["lineage"]) < len(c.attrs["lineage"])


def test_wcc_warm_start_new_vertices(tmp_path):
    """Vertices absent from the prior label themselves (own id) and still
    converge to the cold components."""
    g = build_graph(
        _edges_ds([0, 1], [1, 2]), str(tmp_path / "wccnv"),
        num_partitions=2, symmetrize=True,
    )
    prior = algorithms.wcc(g)
    g = add_edges(g, _edges_ds([5, 6], [6, 7]))  # disjoint new component
    cold = algorithms.wcc(g)
    warm = algorithms.wcc(g, warm_start=prior)
    c = cold.sort_values("vertex_id").reset_index(drop=True)
    w = warm.sort_values("vertex_id").reset_index(drop=True)
    assert (c["value"] == w["value"]).all()
    assert set(w["value"]) == {0, 5}
