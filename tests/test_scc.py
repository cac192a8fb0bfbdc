"""SCC (A12) vs iterative Tarjan oracle."""

import numpy as np
import pytest

from flashray import fixtures, scc
from flashray.build import build_graph_from_arrays

import oracles


def _run(src, dst, tmp_path, name):
    g = build_graph_from_arrays(
        np.asarray(src, dtype=np.int64), np.asarray(dst, dtype=np.int64),
        str(tmp_path / name), num_partitions=4,
    )
    df = scc.scc(g, scratch_dir=str(tmp_path / (name + "_scc")))
    got = dict(zip(df["vertex_id"].astype(int), df["value"].astype(int)))
    want = oracles.scc_tarjan(np.asarray(src), np.asarray(dst))
    assert got == want


def test_scc_cycle3(tmp_path):
    _run([0, 1, 2], [1, 2, 0], tmp_path, "c3")


def test_scc_path(tmp_path):
    _run([0, 1, 2, 3], [1, 2, 3, 4], tmp_path, "path")


def test_scc_tail_into_cycle(tmp_path):
    # 0 -> 5 -> 6 -> 7 -> 5, plus 7 -> 9
    _run([0, 5, 6, 7, 7], [5, 6, 7, 5, 9], tmp_path, "tail")


def test_scc_two_cycles_bridge(tmp_path):
    # cycle {1,2,3} -> bridge -> cycle {10,11}
    src = [1, 2, 3, 3, 10, 11]
    dst = [2, 3, 1, 10, 11, 10]
    _run(src, dst, tmp_path, "twoc")


def test_scc_er_random(tmp_path):
    rng = np.random.default_rng(11)
    n = 60
    adj = (rng.random((n, n)) < 0.06) & ~np.eye(n, dtype=bool)
    src, dst = np.nonzero(adj)
    _run(src, dst, tmp_path, "er")


def test_condensation_matches_tarjan_quotient(tmp_path):
    rng = np.random.default_rng(103)
    n = 60
    # sparse random part + planted cycles with bridges so the quotient
    # is a NON-trivial DAG (a dense digraph collapses to one giant SCC)
    src = rng.integers(0, n, 70).astype(np.int64)
    dst = rng.integers(0, n, 70).astype(np.int64)
    cyc = np.array(
        [50, 51, 52, 50, 55, 56, 55, 52, 56], dtype=np.int64
    )
    cyd = np.array(
        [51, 52, 50, 55, 56, 55, 3, 56, 7], dtype=np.int64
    )
    src = np.concatenate([src, cyc])
    dst = np.concatenate([dst, cyd])
    keep = src != dst
    src, dst = src[keep], dst[keep]
    g = build_graph_from_arrays(
        src, dst, str(tmp_path / "cond"), num_partitions=4
    )
    got = (
        scc.condensation(g, scratch_dir=str(tmp_path / "cond_scc"))
        .to_pandas()
        .sort_values(["src_scc", "dst_scc"])
        .reset_index(drop=True)
    )
    lab = oracles.scc_tarjan(src, dst)
    want = sorted(
        {
            (lab[int(s)], lab[int(d)])
            for s, d in zip(src, dst)
            if lab[int(s)] != lab[int(d)]
        }
    )
    assert len(want) > 30  # fixture sanity: non-trivial quotient
    assert list(map(tuple, got.to_numpy())) == want
    # quotient is a DAG: no pair appears in both directions and a
    # topological order exists (Kahn's algorithm consumes every node)
    pairs = set(want)
    assert not any((b, a) in pairs for a, b in pairs)
    nodes = {x for p in pairs for x in p}
    indeg = {v: 0 for v in nodes}
    for _, b in pairs:
        indeg[b] += 1
    from collections import deque

    q = deque(v for v in nodes if indeg[v] == 0)
    seen = 0
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
    while q:
        v = q.popleft(); seen += 1
        for w in adj.get(v, []):
            indeg[w] -= 1
            if indeg[w] == 0:
                q.append(w)
    assert seen == len(nodes)
