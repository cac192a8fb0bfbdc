"""Format converters (SURVEY.md §2.3 S5): edge-list text, Matrix Market,
JSONL/CSV transcripts — all round-trip through real files."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from flashray import algorithms, convert, fixtures
from flashray.build import build_graph_from_arrays

import oracles


@pytest.fixture()
def edge_file(tmp_path):
    p = tmp_path / "edges.txt"
    p.write_text(
        "# SNAP-style comment\n"
        "0 1\n"
        "1 2\n"
        "2 0\n"
        "\n"
        "3 0\n"
    )
    return str(p)


def test_read_edge_list(edge_file):
    df = convert.read_edge_list(edge_file).to_pandas()
    got = sorted(zip(df["src"], df["dst"]))
    assert got == [(0, 1), (1, 2), (2, 0), (3, 0)]
    assert df["src"].dtype == np.int64


def test_edge_list_roundtrip(tmp_path, edge_file):
    ds = convert.read_edge_list(edge_file)
    out = tmp_path / "out"
    convert.write_edge_list(ds, str(out))
    back = convert.read_edge_list(
        [str(f) for f in out.iterdir()], delimiter=" "
    ).to_pandas()
    assert sorted(zip(back["src"], back["dst"])) == [
        (0, 1), (1, 2), (2, 0), (3, 0)
    ]


def test_weighted_edge_list(tmp_path):
    p = tmp_path / "w.txt"
    p.write_text("0 1 2.5\n1 2 0.5\n2 0\n")
    df = convert.read_edge_list(str(p), weighted=True).to_pandas()
    by = {(s, d): w for s, d, w in zip(df["src"], df["dst"], df["weight"])}
    assert by == {(0, 1): 2.5, (1, 2): 0.5, (2, 0): 1.0}


def test_el2fg_pipeline(tmp_path, edge_file):
    """el2fg parity: text edge list → graph → PageRank matches the same
    graph built from arrays."""
    g = convert.edge_list_to_graph(edge_file, str(tmp_path / "g"),
                                   num_partitions=2)
    pr = algorithms.pagerank(g)
    src = np.array([0, 1, 2, 3]); dst = np.array([1, 2, 0, 0])
    g2 = build_graph_from_arrays(src, dst, str(tmp_path / "g2"),
                                 num_partitions=2)
    pr2 = algorithms.pagerank(g2)
    a = pr.sort_values("vertex_id")["value"].to_numpy()
    b = pr2.sort_values("vertex_id")["value"].to_numpy()
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_matrix_market(tmp_path):
    p = tmp_path / "m.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        "% a comment\n"
        "4 4 3\n"
        "1 2 1.0\n"
        "2 3 2.0\n"
        "4 1 0.5\n"
    )
    ds, (nr, nc, nnz) = convert.read_matrix_market(str(p))
    assert (nr, nc, nnz) == (4, 4, 3)
    df = ds.to_pandas().sort_values(["src", "dst"], ignore_index=True)
    assert list(zip(df["src"], df["dst"], df["weight"])) == [
        (0, 1, 1.0), (1, 2, 2.0), (3, 0, 0.5)
    ]


def test_transcripts_jsonl_roundtrip(tmp_path):
    """North-rule invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering survives the JSONL round-trip."""
    src = tmp_path / "t.parquet"
    fixtures.write_transcripts(str(src), "unit")
    orig = rd.read_parquet(str(src))
    out = tmp_path / "jsonl"
    convert.write_transcripts_jsonl(orig, str(out))
    back = convert.read_transcripts_jsonl(
        [str(f) for f in out.iterdir()]
    ).to_pandas()
    a = orig.to_pandas().sort_values(["conv_id", "turn_idx"],
                                     ignore_index=True)
    b = back.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    assert list(a.columns.sort_values()) == list(b.columns.sort_values())
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_transcripts_csv_roundtrip(tmp_path):
    src = tmp_path / "t.parquet"
    fixtures.write_transcripts(str(src), "unit")
    orig = rd.read_parquet(str(src))
    out = tmp_path / "csv"
    convert.write_transcripts_csv(orig, str(out))
    back = convert.read_transcripts_csv(
        [str(f) for f in out.iterdir()]
    ).to_pandas()
    a = orig.to_pandas().sort_values(["conv_id", "turn_idx"],
                                     ignore_index=True)
    b = back.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_rmat_deterministic_and_skewed():
    from flashray.convert import rmat_edges

    a = rmat_edges(8, 8, seed=7).to_pandas().reset_index(drop=True)
    b = (
        rmat_edges(8, 8, seed=7)
        .repartition(13)
        .to_pandas()
        .sort_values(["src", "dst"], kind="mergesort")
    )
    a2 = a.sort_values(["src", "dst"], kind="mergesort")
    assert len(a) == 8 * 256
    assert (a2.to_numpy() == b.to_numpy()).all()
    assert a["src"].between(0, 255).all() and a["dst"].between(0, 255).all()
    # power-law-ish: top out-degree vertex far above the mean (=8)
    vc = a["src"].value_counts()
    assert vc.iloc[0] > 4 * 8
    # a different seed gives a different graph
    c = rmat_edges(8, 8, seed=8).to_pandas()
    assert not (a2.to_numpy() == c.sort_values(
        ["src", "dst"], kind="mergesort").to_numpy()).all()


def test_rmat_quadrant_frequencies():
    from flashray.convert import rmat_edges

    df = rmat_edges(10, 16, a=0.45, b=0.15, c=0.15, seed=3).to_pandas()
    # the TOP bit of (src, dst) encodes the first-level quadrant choice
    top_src = (df["src"] >= 512).to_numpy()
    top_dst = (df["dst"] >= 512).to_numpy()
    n = len(df)
    freq_a = ((~top_src) & (~top_dst)).sum() / n
    freq_b = ((~top_src) & top_dst).sum() / n
    freq_c = (top_src & (~top_dst)).sum() / n
    assert abs(freq_a - 0.45) < 0.02
    assert abs(freq_b - 0.15) < 0.02
    assert abs(freq_c - 0.15) < 0.02
