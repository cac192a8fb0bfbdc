"""Sparse exchange format: late-BFS supersteps ship O(frontier) partial
entries, not O(G) identity-filled dense arrays — and results stay
bit-identical to the dense path."""

import numpy as np

from flashray import algorithms, fixtures
from flashray.build import build_graph_from_arrays

import oracles


def test_bfs_long_path_exchange_is_frontier_sized(tmp_path):
    # a 400-vertex path plus a 100-clique bolted to vertex 0: early
    # supersteps are dense (clique), late ones are single-vertex frontier
    n = 400
    src = list(range(n - 1))
    dst = list(range(1, n))
    for i in range(1000, 1100):
        for j in range(1000, 1100):
            if i != j:
                src.append(i)
                dst.append(j)
    src.append(0)
    dst.append(1000)
    src, dst = np.asarray(src, dtype=np.int64), np.asarray(dst, dtype=np.int64)
    g = build_graph_from_arrays(
        src, dst, str(tmp_path / "longpath"), num_partitions=8
    )
    df = algorithms.bfs(g, [0])
    want = oracles.bfs_dist(src, dst, [0])
    got = dict(zip(df["vertex_id"].astype(int), df["value"].astype(int)))
    assert got == want
    lin = df.attrs["lineage"]
    assert all("exchanged" in r for r in lin)
    # late supersteps (deep in the path, frontier = 1 vertex) must ship
    # only a handful of partial entries, far below the dense group count
    late = [r["exchanged"] for r in lin[-20:] if r["messages"] > 0]
    assert late and max(late) <= 8, late
    # early clique supersteps are legitimately dense
    assert max(r["exchanged"] for r in lin) > 100
