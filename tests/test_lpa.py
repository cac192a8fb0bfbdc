"""Most-frequent-label community detection (synchronous LPA dataflow)."""

import numpy as np
import pandas as pd
import ray.data as rd

from flashray.lpa import lpa_communities


def _replay_lpa(src, dst, sweeps):
    """Independent synchronous replay: label(v) starts at v; per sweep,
    v takes the most frequent label among in-neighbors (ties -> smallest
    label); vertices with no in-edges keep their label."""
    verts = sorted(set(map(int, src)) | set(map(int, dst)))
    inn = {v: [] for v in verts}
    for s, d in zip(src, dst):
        inn[int(d)].append(int(s))
    lab = {v: v for v in verts}
    for _ in range(sweeps):
        new = {}
        for v in verts:
            if not inn[v]:
                new[v] = lab[v]
                continue
            counts = {}
            for u in inn[v]:
                counts[lab[u]] = counts.get(lab[u], 0) + 1
            new[v] = min(counts, key=lambda L: (-counts[L], L))
        lab = new
    return lab


def _to_df(labels_ds):
    df = labels_ds.to_pandas()
    return dict(
        zip(df["vertex_id"].astype(int), df["label"].astype(int))
    )


def _sym(src, dst):
    return src + dst, dst + src


def test_lpa_matches_independent_replay():
    rng = np.random.default_rng(23)
    n = 40
    seen = set()
    for _ in range(150):
        a, b = rng.integers(0, n, 2)
        if a != b:
            seen.add((int(a), int(b)))
    src = [a for a, _ in sorted(seen)]
    dst = [b for _, b in sorted(seen)]
    edges = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
    for sweeps in (1, 3):
        got = _to_df(lpa_communities(edges, sweeps=sweeps, num_buckets=8))
        want = _replay_lpa(src, dst, sweeps)
        assert got == want


def test_lpa_partition_invariant():
    rng = np.random.default_rng(7)
    n = 25
    seen = set()
    for _ in range(90):
        a, b = rng.integers(0, n, 2)
        if a != b:
            seen.add((int(a), int(b)))
            seen.add((int(b), int(a)))
    df = pd.DataFrame(
        {"src": [a for a, _ in sorted(seen)],
         "dst": [b for _, b in sorted(seen)]}
    )
    a = _to_df(lpa_communities(
        rd.from_pandas(df).repartition(1), sweeps=2, num_buckets=4
    ))
    b = _to_df(lpa_communities(
        rd.from_pandas(df).repartition(6), sweeps=2, num_buckets=16
    ))
    assert a == b


def _two_cliques_edges():
    """Two 6-cliques joined by a single bridge edge — the canonical
    community structure LPA must recover."""
    src, dst = [], []
    for base in (0, 6):
        for i in range(6):
            for j in range(i + 1, 6):
                src.append(base + i)
                dst.append(base + j)
    src.append(5)
    dst.append(6)
    return _sym(src, dst)


def test_lpa_recovers_cliques_and_improves_modularity(tmp_path):
    import ray.data

    from flashray import algorithms
    from flashray.build import build_graph
    from flashray.fixtures import edges_table

    src, dst = _two_cliques_edges()
    edges = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
    lab = _to_df(lpa_communities(edges, sweeps=4, num_buckets=4))
    # each clique collapses to one label
    assert len({lab[v] for v in range(6)}) == 1
    assert len({lab[v] for v in range(6, 12)}) == 1
    assert lab[0] != lab[6]

    g = build_graph(
        ray.data.from_arrow(
            edges_table(np.asarray(src), np.asarray(dst))
        ),
        str(tmp_path / "cliq"),
        num_partitions=2,
    )
    lpa_labels = pd.DataFrame(
        {"vertex_id": sorted(lab), "label": [lab[v] for v in sorted(lab)]}
    )
    q_lpa = algorithms.modularity(g, lpa_labels)
    # deterministic "random" labeling: alternate labels ignore structure
    rand_labels = pd.DataFrame(
        {"vertex_id": sorted(lab), "label": [v % 2 for v in sorted(lab)]}
    )
    q_rand = algorithms.modularity(g, rand_labels)
    assert q_lpa > 0.3
    assert q_lpa > q_rand + 0.2
