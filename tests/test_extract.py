"""Extraction-stage correctness vs DuckDB oracles (SURVEY.md §5 item 2)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from flashray import extract, fixtures, ids


def _edges_keys_oracle_sql(tier: str) -> str:
    t_sql = fixtures.transcripts_sql(tier)
    return f"""
WITH t AS ({t_sql}),
raw AS (
  SELECT 'turn:' || a.conv_id || ':' || a.turn_idx AS src_key,
         'turn:' || b.conv_id || ':' || b.turn_idx AS dst_key,
         'reply' AS etype
  FROM t a JOIN t b ON a.conv_id = b.conv_id AND a.turn_idx + 1 = b.turn_idx
  UNION ALL
  SELECT 'turn:' || conv_id || ':' || turn_idx, 'tool:' || tool, 'tool'
  FROM t WHERE tool IS NOT NULL
  UNION ALL
  SELECT 'turn:' || conv_id || ':' || turn_idx, 'role:' || role, 'role' FROM t
)
SELECT src_key, dst_key, etype, CAST(COUNT(*) AS DOUBLE) AS weight
FROM raw GROUP BY 1, 2, 3
"""


def _sorted_pandas(obj, keys):
    df = obj.to_pandas() if not hasattr(obj, "sort_values") else obj
    return df.sort_values(keys).reset_index(drop=True)


def test_extract_keys_vs_duckdb():
    tier = "small"
    t = fixtures.transcripts_for_tier(tier)
    ds = rd.from_arrow(t).map_batches(
        extract.extract_edges_keys_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    from ray.data.aggregate import Count

    got = (
        ds.groupby(["src_key", "dst_key", "etype"])
        .aggregate(Count(alias_name="cnt"))
        .to_pandas()
    )
    got["weight"] = got.pop("cnt").astype(float)
    want = duckdb.sql(_edges_keys_oracle_sql(tier)).df()
    keys = ["src_key", "dst_key", "etype"]
    got, want = _sorted_pandas(got, keys), _sorted_pandas(want, keys)
    assert len(got) == len(want)
    for col in keys + ["weight"]:
        assert (got[col].values == want[col].values).all(), col


def test_extract_int_ids_consistent_with_keys():
    """The int64-id edge set must be the image of the key edge set under the
    stable hash (id64 for entities, the mixer for turns)."""
    t = fixtures.transcripts_for_tier("unit")
    keys = extract.extract_edges_keys_batch(t).to_pandas()
    ints = extract.extract_edges_batch(t).to_pandas()

    def key_to_id(k: str) -> int:
        kind, rest = k.split(":", 1)
        if kind == "turn":
            conv, idx = rest.rsplit(":", 1)
            return int(ids.turn_vertex_ids([conv], [int(idx)])[0])
        return ids.id64(k)

    got = set(zip(ints["src"], ints["dst"], ints["etype"]))
    want = {
        (key_to_id(r.src_key), key_to_id(r.dst_key), r.etype)
        for r in keys.itertuples()
    }
    assert got == want


def test_dedup_edges_weights():
    t = fixtures.transcripts_for_tier("unit")
    # duplicate the transcript -> every edge weight doubles
    doubled = pa.concat_tables([t, t])
    ds = extract.extract_edges(rd.from_arrow(doubled))
    deduped = extract.dedup_edges(ds).to_pandas()
    single = extract.dedup_edges(extract.extract_edges(rd.from_arrow(t))).to_pandas()
    assert len(deduped) == len(single)
    m = deduped.sort_values(["src", "dst", "etype"]).reset_index(drop=True)
    s = single.sort_values(["src", "dst", "etype"]).reset_index(drop=True)
    assert (m["weight"].values == 2 * s["weight"].values).all()
    assert (m["ts"].values == s["ts"].values).all()


def test_passthrough_invariant():
    """Per-turn text equality under stable (conv_id, turn_idx) ordering."""
    t = fixtures.transcripts_for_tier("small")
    shuffled = t.take(np.random.default_rng(7).permutation(t.num_rows))
    out = extract.normalize_transcripts(rd.from_arrow(shuffled)).to_pandas()
    want = t.to_pandas()
    assert (out["text"].values == want["text"].values).all()
    assert (out["conv_id"].values == want["conv_id"].values).all()
    assert (out["turn_idx"].values == want["turn_idx"].values).all()


def test_turn_ids_stable_and_distinct():
    t = fixtures.transcripts_for_tier("sf0.01")
    conv = t["conv_id"].to_numpy(zero_copy_only=False)
    idx = t["turn_idx"].to_numpy(zero_copy_only=False)
    a = ids.turn_vertex_ids(conv, idx)
    b = ids.turn_vertex_ids(conv, idx)
    assert (a == b).all()
    assert len(np.unique(a)) == len(a)  # no collisions at this scale
    assert (a >= 0).all()


def test_extract_sorted_gapped_turns():
    """extract_edges_sorted handles sparse turn_idx; on dense input it must
    agree with the arithmetic extractor."""
    t = fixtures.transcripts_for_tier("unit")
    dense = extract.dedup_edges(extract.extract_edges(rd.from_arrow(t))).to_pandas()
    sorted_ = extract.dedup_edges(
        extract.extract_edges_sorted(rd.from_arrow(t))
    ).to_pandas()
    key = ["src", "dst", "etype"]
    a = dense.sort_values(key).reset_index(drop=True)
    b = sorted_.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    for c in key + ["weight"]:
        assert (a[c].values == b[c].values).all(), c

    # gapped: drop every 3rd turn -> reply edges follow the REMAINING order
    pdf = t.to_pandas()
    gapped = pdf[pdf["turn_idx"] % 3 != 2]
    out = extract.extract_edges_sorted(rd.from_pandas(gapped)).to_pandas()
    n_reply = (out["etype"] == "reply").sum()
    want_reply = sum(
        max(0, n - 1) for n in gapped.groupby("conv_id").size()
    )
    assert n_reply == want_reply
