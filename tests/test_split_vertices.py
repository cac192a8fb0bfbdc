"""Split-vertex (E12 vertical partitioning) correctness for NON-idempotent
programs.

PageRank (fixpoint-tolerant) and WCC (idempotent min) mask mirror-broadcast
version bugs; Brandes sigma accumulation, k-core degree decrements, and SCC
floods do not — a one-superstep-stale mirror signal gives wrong answers on
any graph with split hubs. These tests pin the engine's two-phase round
(apply_only → scatter_from) against dense oracles on a hub graph whose hub
is forced to split (low skew_threshold).
"""

import numpy as np
import pytest

from flashray import algorithms, betweenness as bw, scc as sccmod
from flashray.build import Graph, build_graph_from_arrays

import oracles


def hub_edges(n=14, chords=20, seed=7):
    """Directed graph: hub 0 <-> every cycle vertex, a 1..n cycle, plus
    random chords — deep enough for multi-level BFS/peeling through the
    split hub, and non-trivial SCC structure."""
    rng = np.random.default_rng(seed)
    src = [0] * n + list(range(1, n + 1))
    dst = list(range(1, n + 1)) + [0] * n
    for i in range(1, n):
        src.append(i)
        dst.append(i + 1)
    src.append(n)
    dst.append(1)
    a = rng.integers(1, n + 1, chords)
    b = rng.integers(1, n + 1, chords)
    m = a != b
    src += a[m].tolist()
    dst += b[m].tolist()
    # dedup (the build dedups too; oracles count raw edge multiplicity)
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
    return pairs[:, 0].astype(np.int64), pairs[:, 1].astype(np.int64)


@pytest.fixture(scope="module")
def hub_graph(tmp_path_factory):
    src, dst = hub_edges()
    path = str(tmp_path_factory.mktemp("split") / "hub")
    g = build_graph_from_arrays(
        src, dst, path, num_partitions=4, skew_threshold=8
    )
    assert len(g.meta.split_vertices) >= 1
    return g, (src, dst)


def test_betweenness_split_hub_matches_brandes(hub_graph, tmp_path):
    g, (src, dst) = hub_graph
    scratch = str(tmp_path / "bw")
    # force the bidirected graph to split the hub as well
    import os

    bi_path = os.path.join(scratch, "bidirected")
    sccmod.build_bidirected(g, bi_path, skew_threshold=8)
    assert len(Graph.load(bi_path).meta.split_vertices) >= 1
    df = bw.betweenness(g, scratch_dir=scratch, sources=None, normalize=False)
    want = oracles.betweenness_brandes(src, dst)
    got = dict(zip(df["vertex_id"].astype(int), df["value"]))
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-8, v


def test_kcore_split_hub_matches_peeling(tmp_path):
    src, dst = hub_edges()
    g = build_graph_from_arrays(
        src, dst, str(tmp_path / "ksym"), num_partitions=4,
        symmetrize=True, skew_threshold=8,
    )
    assert len(g.meta.split_vertices) >= 1
    df = algorithms.kcore(g)
    want = oracles.kcore_peel(src, dst)
    got = dict(zip(df["vertex_id"].astype(int), df["value"].astype(int)))
    assert got == want


def test_scc_split_hub_matches_tarjan(hub_graph, tmp_path):
    g, (src, dst) = hub_graph
    scratch = str(tmp_path / "scc")
    import os

    bi_path = os.path.join(scratch, "bidirected")
    sccmod.build_bidirected(g, bi_path, skew_threshold=8)
    assert len(Graph.load(bi_path).meta.split_vertices) >= 1
    df = sccmod.scc(g, scratch_dir=scratch)
    want = oracles.scc_tarjan(src, dst)
    got = dict(zip(df["vertex_id"].astype(int), df["value"].astype(int)))
    assert got == want


def test_bfs_split_hub_matches_oracle(hub_graph):
    g, (src, dst) = hub_graph
    df = algorithms.bfs(g, [1])
    want = oracles.bfs_dist(src, dst, [1])
    got = dict(zip(df["vertex_id"].astype(int), df["value"].astype(int)))
    assert got == want


def test_kcore_resume_mid_decomposition(tmp_path):
    """Resume must restore the phase counter k (scalar state), not re-peel
    from k=1 against already-decremented residual degrees."""
    src, dst = hub_edges()
    g = build_graph_from_arrays(
        src, dst, str(tmp_path / "kres"), num_partitions=4,
        symmetrize=True,
    )
    want = oracles.kcore_peel(src, dst)
    ckpt = str(tmp_path / "ckpt")
    # interrupted run: checkpoint every superstep, stop early
    algorithms.kcore(
        g, checkpoint_dir=ckpt, checkpoint_interval=1, max_supersteps=3
    )
    resumed = algorithms.kcore(g, checkpoint_dir=ckpt, resume=True)
    got = dict(
        zip(resumed["vertex_id"].astype(int), resumed["value"].astype(int))
    )
    assert got == want


def test_stale_mirror_resume_exact_push_pagerank(tmp_path):
    """Stale-mirror fused rounds (stale_mirror_safe programs) must resume
    bit-identically: push PageRank's delta sums are only exactly-once if
    the restore replays the in-flight mirror (Engine mirror.npy) instead
    of bootstrapping a fresh one."""
    from flashray.engine import Engine
    from flashray.programs import DeltaPageRank

    src, dst = hub_edges()
    g = build_graph_from_arrays(
        src, dst, str(tmp_path / "hubpr"), num_partitions=4, skew_threshold=8
    )
    assert len(g.meta.split_vertices) >= 1

    def run(iters, ckpt_dir=None, resume=False):
        with Engine(g, DeltaPageRank(tol=0.0)) as eng:
            assert eng._stale_mirrors  # the path under test
            if resume:
                eng.restore(ckpt_dir)
            while eng.iteration < iters:
                eng.step()
                if ckpt_dir is not None and not resume:
                    eng.checkpoint(ckpt_dir)
            return (
                eng.values_pandas()
                .sort_values("vertex_id")
                .reset_index(drop=True)
            )

    full = run(12)
    ckpt = str(tmp_path / "ckpt")
    run(5, ckpt_dir=ckpt)
    resumed = run(12, ckpt_dir=ckpt, resume=True)
    assert (full["value"].to_numpy() == resumed["value"].to_numpy()).all()


def test_stale_mirror_pagerank_matches_oracle(tmp_path):
    """Pull PageRank on a forced-split graph (fused stale-mirror rounds)
    still converges to the dense oracle within eps."""
    src, dst = hub_edges()
    g = build_graph_from_arrays(
        src, dst, str(tmp_path / "hubpull"), num_partitions=4, skew_threshold=8
    )
    assert len(g.meta.split_vertices) >= 1
    df = algorithms.pagerank(g, eps=1e-12)
    want = oracles.pagerank_dense(src, dst, eps=1e-12)
    df = df.sort_values("vertex_id")
    got = df["value"].to_numpy()
    expect = np.array([want[int(v)] for v in df["vertex_id"]])
    np.testing.assert_allclose(got, expect, atol=1e-8)
