"""Graph-level operators: subgraph fetch (A16), time windows (A14),
weighted PageRank."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from flashray import algorithms, api, fixtures
from flashray.build import build_graph, build_graph_from_arrays

import oracles


@pytest.fixture(scope="module")
def er_graph(tmp_path_factory):
    src, dst = fixtures.er_edges()
    g = build_graph_from_arrays(
        src, dst, str(tmp_path_factory.mktemp("apig") / "er"), num_partitions=4
    )
    return g, (src, dst)


def test_induced_subgraph_pagerank(er_graph, tmp_path):
    g, (src, dst) = er_graph
    keep = set(range(0, 50))
    m = np.isin(src, list(keep)) & np.isin(dst, list(keep))
    sub = api.induced_subgraph(g, keep, str(tmp_path / "sub"), num_partitions=4)
    assert sub.meta.num_edges == int(m.sum())
    df = algorithms.pagerank(sub, eps=1e-10)
    want = oracles.pagerank_dense(src[m], dst[m], eps=1e-10)
    got = dict(zip(df["vertex_id"], df["value"]))
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-6


def test_window_edges(tmp_path):
    # fixture edges all share one ts; build a small graph with varying ts
    src = np.arange(20, dtype=np.int64)
    dst = (src + 1) % 20
    ts = (fixtures.EPOCH_US + src * 1_000_000).astype("datetime64[us]")
    t = pa.table(
        {
            "src": src,
            "dst": dst,
            "etype": ["fix"] * 20,
            "weight": np.ones(20),
            "ts": ts,
        }
    )
    g = build_graph(rd.from_arrow(t), str(tmp_path / "wg"), num_partitions=4)
    win = api.window_edges(
        g, "2026-01-01T00:00:05", "2026-01-01T00:00:15"
    ).to_pandas()
    assert len(win) == 10
    assert set(win["src"]) == set(range(5, 15))
    wg = api.window_graph(
        g, "2026-01-01T00:00:05", "2026-01-01T00:00:15", str(tmp_path / "wg2")
    )
    assert wg.meta.num_edges == 10


def test_weighted_pagerank(tmp_path):
    src, dst = fixtures.er_edges(60, 0.08, seed=7)
    w = ((src + dst) % 3 + 1).astype(float)
    t = pa.table(
        {
            "src": src,
            "dst": dst,
            "etype": ["fix"] * len(src),
            "weight": w,
            "ts": np.full(len(src), fixtures.EPOCH_US).astype("datetime64[us]"),
        }
    )
    g = build_graph(
        rd.from_arrow(t), str(tmp_path / "weighted"), num_partitions=4, dedup=False
    )
    df = algorithms.pagerank(g, eps=1e-10, weighted=True)
    want = oracles.pagerank_weighted_dense(src, dst, w, eps=1e-10)
    got = dict(zip(df["vertex_id"], df["value"]))
    for v in want:
        assert abs(got[v] - want[v]) < 1e-6, v
    # unweighted on the same graph must differ (sanity that the flag works)
    un = algorithms.pagerank(g, eps=1e-10)
    assert not np.allclose(
        df.sort_values("vertex_id")["value"], un.sort_values("vertex_id")["value"]
    )


def test_egonet_edges(er_graph):
    g, (src, dst) = er_graph
    # python oracle: directed BFS ball of radius 2 from two seeds
    adj = {}
    for s, d in zip(src, dst):
        adj.setdefault(int(s), set()).add(int(d))
    seeds = [int(min(src)), int(max(src))]
    ball = set(seeds)
    frontier = set(seeds)
    for _ in range(2):
        frontier = {d for v in frontier for d in adj.get(v, ())} - ball
        ball |= frontier
    want = {
        (int(s), int(d))
        for s, d in zip(src, dst)
        if int(s) in ball and int(d) in ball
    }
    got_df = api.egonet_edges(g, seeds, hops=2).to_pandas()
    got = set(zip(got_df["src"].astype(int), got_df["dst"].astype(int)))
    assert got == want and len(want) > 0


def test_degree_assortativity_matches_dense():
    src, dst = fixtures.er_edges(50, 0.06, seed=23)
    e = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    got = algorithms.degree_assortativity(e, num_buckets=8)
    # dense oracle
    import collections

    od = collections.Counter(map(int, src))
    idg = collections.Counter(map(int, dst))
    x = np.array([od[int(s)] for s in src], dtype=float)
    y = np.array([idg[int(d)] for d in dst], dtype=float)
    want = np.corrcoef(x, y)[0, 1]
    assert abs(got - want) < 1e-12


def test_degree_assortativity_star_disassortative():
    # hub fanning out to leaves (high out-deg -> mostly in-deg 1) plus a
    # low-out-degree 2-cycle whose endpoints have in-deg 2: r < 0
    src = np.array([0] * 10 + [1, 2], dtype=np.int64)
    dst = np.array(list(range(1, 11)) + [2, 1], dtype=np.int64)
    e = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    got = algorithms.degree_assortativity(e, num_buckets=4)
    assert got < 0


def _ns_oracle(src, dst, seeds, fanout):
    """Python replay of the sha-priority fanout sample."""
    import hashlib

    def pri(a, b):
        h = int.from_bytes(
            hashlib.sha256(f"ns:{a}:{b}".encode()).digest()[:8], "big"
        )
        return h >> 1

    adj = {}
    for a, b in set(zip(src.tolist(), dst.tolist())):
        adj.setdefault(a, []).append(b)
    frontier = sorted(set(int(s) for s in seeds))
    rows = []
    for h, k in enumerate(fanout, start=1):
        nxt = set()
        for u in frontier:
            nbrs = sorted(adj.get(u, []), key=lambda v: (pri(u, v), v))[:k]
            for v in nbrs:
                rows.append((h, u, v))
                nxt.add(v)
        frontier = sorted(nxt)
    return sorted(rows)


def test_neighbor_sample_matches_sha_replay(er_graph):
    g, (src, dst) = er_graph
    seeds = [0, 1, 2]
    got = (
        api.neighbor_sample(g, seeds, [3, 2])
        .to_pandas().sort_values(["hop", "src", "dst"])
        .reset_index(drop=True)
    )
    want = _ns_oracle(src, dst, seeds, [3, 2])
    assert list(map(tuple, got.to_numpy())) == want
    # fanout respected: at most k sampled neighbors per (hop, src)
    per = got.groupby(["hop", "src"]).size()
    assert per[per.index.get_level_values("hop") == 1].max() <= 3
    assert per[per.index.get_level_values("hop") == 2].max() <= 2


def test_neighbor_sample_partition_invariant(er_graph, tmp_path):
    g, (src, dst) = er_graph
    g2 = build_graph_from_arrays(
        src, dst, str(tmp_path / "er2"), num_partitions=2
    )
    a = (
        api.neighbor_sample(g, [5, 9], [4, 3], num_buckets=4)
        .to_pandas().sort_values(["hop", "src", "dst"])
        .reset_index(drop=True)
    )
    b = (
        api.neighbor_sample(g2, [5, 9], [4, 3], num_buckets=16)
        .to_pandas().sort_values(["hop", "src", "dst"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_partition_stats_counts(tmp_path):
    from flashray.build import build_graph_from_arrays, partition_stats

    rng = np.random.default_rng(9)
    src = rng.integers(0, 40, 300).astype(np.int64)
    dst = rng.integers(0, 40, 300).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    g = build_graph_from_arrays(src, dst, str(tmp_path / "ps"),
                                num_partitions=4)
    got = partition_stats(g)
    # reference over the deduped edge set the build wrote
    e = g.edges_dataset(columns=["src", "dst"]).to_pandas()
    part = (e["src"] % 4).to_numpy()
    cut = part != (e["dst"] % 4).to_numpy()
    want_n = np.bincount(part, minlength=4)
    want_c = np.bincount(part[cut], minlength=4)
    assert list(got["part"]) == [0, 1, 2, 3]
    assert list(got["n_edges"]) == want_n.tolist()
    assert list(got["n_cut"]) == want_c.tolist()
    assert np.allclose(got["cut_frac"], want_c / np.maximum(want_n, 1))


def test_negative_edges_deterministic_and_disjoint(tmp_path):
    from flashray.api import negative_edges
    from flashray.build import build_graph_from_arrays

    rng = np.random.default_rng(5)
    src = rng.integers(0, 30, 200).astype(np.int64)
    dst = rng.integers(0, 30, 200).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    g = build_graph_from_arrays(src, dst, str(tmp_path / "ne"),
                                num_partitions=2)
    a = negative_edges(g, 20, seed=3)
    b = negative_edges(g, 20, seed=3)
    assert a.equals(b)  # bit-identical across runs
    assert len(a) == 20
    edge_set = set(zip(g.edges_dataset(columns=["src", "dst"])
                       .to_pandas()["src"],
                       g.edges_dataset(columns=["src", "dst"])
                       .to_pandas()["dst"]))
    for r in a.itertuples():
        assert r.src != r.dst
        assert (r.src, r.dst) not in edge_set
    # different seed, different sample
    c = negative_edges(g, 20, seed=4)
    assert not a.equals(c)


def test_quotient_edges_matches_brute(tmp_path):
    from flashray.api import quotient_edges
    from flashray.build import build_graph_from_arrays

    rng = np.random.default_rng(2)
    src = rng.integers(0, 30, 150).astype(np.int64)
    dst = rng.integers(0, 30, 150).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    g = build_graph_from_arrays(src, dst, str(tmp_path / "q"),
                                num_partitions=4)
    import pandas as pd

    labels = pd.DataFrame(
        {"vertex_id": np.arange(30, dtype=np.int64),
         "label": (np.arange(30) % 4).astype(np.int64)}
    )
    got = (
        quotient_edges(g, labels)
        .to_pandas()
        .sort_values(["label_src", "label_dst"])
        .reset_index(drop=True)
    )
    # brute: sum deduped-edge weights per label pair
    e = g.edges_dataset(columns=["src", "dst", "weight"]).to_pandas()
    e["label_src"] = e["src"] % 4
    e["label_dst"] = e["dst"] % 4
    want = (
        e.groupby(["label_src", "label_dst"], as_index=False)["weight"]
        .sum()
        .sort_values(["label_src", "label_dst"])
        .reset_index(drop=True)
        .astype({"label_src": np.int64, "label_dst": np.int64})
    )
    pd.testing.assert_frame_equal(
        got[["label_src", "label_dst", "weight"]], want
    )
    noself = quotient_edges(g, labels, self_loops=False).to_pandas()
    assert (noself["label_src"] != noself["label_dst"]).all()
