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
