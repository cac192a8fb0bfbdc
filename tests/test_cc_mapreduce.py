"""Log-rounds large-star/small-star WCC backend vs union-find oracle."""

import numpy as np
import pytest

from flashray import cc_mapreduce, fixtures
from flashray.build import build_graph_from_arrays

import oracles


@pytest.mark.parametrize(
    "name,fn",
    [
        ("k3", fixtures.k3_edges),
        ("two_components", fixtures.two_components_edges),
        ("er100", fixtures.er_edges),
        ("long_path", lambda: fixtures.path_edges(200)),
    ],
)
def test_wcc_mapreduce_matches_union_find(tmp_path, name, fn):
    src, dst = fn()
    g = build_graph_from_arrays(src, dst, str(tmp_path / name), num_partitions=4)
    df = cc_mapreduce.wcc_mapreduce(g)
    got = dict(zip(df["vertex_id"].astype(int), df["value"].astype(int)))
    want = oracles.wcc_minlabel(src, dst)
    assert got == want


def test_wcc_backends_agree(tmp_path):
    from flashray import algorithms

    src, dst = fixtures.er_edges(80, 0.04, seed=9)
    g = build_graph_from_arrays(src, dst, str(tmp_path / "agree"), num_partitions=4)
    a = cc_mapreduce.wcc_mapreduce(g)
    b = algorithms.wcc(g).sort_values("vertex_id").reset_index(drop=True)
    assert (a["value"].values == b["value"].values).all()


def test_wcc_mapreduce_distributed_matches_local_tail(tmp_path):
    # local_threshold=0 forces star rounds to the fixed point; the default
    # finishes small forests with the in-process union-find — same labels
    src, dst = fixtures.er_edges(120, 0.03, seed=4)
    g = build_graph_from_arrays(
        src, dst, str(tmp_path / "tail"), num_partitions=4
    )
    dist = cc_mapreduce.wcc_mapreduce(g, local_threshold=0)
    loc = cc_mapreduce.wcc_mapreduce(g)
    assert (dist["vertex_id"].values == loc["vertex_id"].values).all()
    assert (dist["value"].values == loc["value"].values).all()
