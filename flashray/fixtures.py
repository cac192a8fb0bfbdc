"""Deterministic synthetic inputs (FIXTURES.md) — transcripts + tiny graphs.

The transcript generator exists twice, by design:

1. :func:`make_transcripts` — vectorized numpy/pyarrow, used by tests, the
   driver contract (``__ray_entry__``) and ``bench.py``;
2. :func:`transcripts_sql` — a DuckDB SQL query that generates the *same*
   table, so extraction-stage oracles are pure SQL with no file side-channel.

Both implement the exact FIXTURES.md §1 formulas (seedless, closed-form).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from flashray.schema import TRANSCRIPT_SCHEMA

ROLES = ("user", "assistant", "tool", "assistant")
TOOLS = ("search", "python", "browser", "sql")
EPOCH_US = np.datetime64("2026-01-01T00:00:00", "us").astype("int64")

# tier -> (n_convs, base_turns, mod_turns)
TIERS = {
    "unit": (16, 3, 6),  # ~90 turns
    "small": (200, 4, 10),  # ~1.7k turns
    "sf0.01": (2_000, 5, 26),  # ~35k turns (driver correctness)
    "bench": (20_000, 5, 46),  # ~550k turns (sf0.1-equivalent)
    "xl": (250_000, 5, 46),  # ~6.9M turns (~15M edges; scaling runs)
    "xxl": (500_000, 5, 46),  # ~13.7M turns (~30M edges; scaling runs)
}


def tier_for_sf_dir(sf_dir: str) -> str:
    """Map a driver testdata dir to a transcript tier of comparable scale."""
    if "0.001" in sf_dir:
        return "small"
    if "0.01" in sf_dir:
        return "sf0.01"
    return "bench"


def make_transcripts(
    n_convs: int, base_turns: int, mod_turns: int, *, skew: bool = False
) -> pa.Table:
    """FIXTURES.md §1 transcript table, fully vectorized."""
    turns_per_conv = base_turns + (np.arange(n_convs, dtype=np.int64) % mod_turns)
    c = np.repeat(np.arange(n_convs, dtype=np.int64), turns_per_conv)
    # t = 0..turns_per_conv[c)-1 within each conv
    starts = np.zeros(n_convs, dtype=np.int64)
    starts[1:] = np.cumsum(turns_per_conv)[:-1]
    t = np.arange(len(c), dtype=np.int64) - starts[c]

    conv_id = np.char.add("conv", np.char.zfill(c.astype("U8"), 8))
    role = np.asarray(ROLES, dtype=object)[t % 4]
    text = np.char.add(
        np.char.add(conv_id, np.char.add("-t", t.astype("U10"))),
        np.char.add("-", role.astype("U16")),
    )
    mix = c * 31 + t
    if skew:
        tool_pick = np.where(mix % 10 != 0, 0, mix % 4)
    else:
        tool_pick = mix % 4
    tool = np.asarray(TOOLS, dtype=object)[tool_pick]
    tool = np.where(role == "tool", tool, None)
    ts = (EPOCH_US + (c * 1000 + t) * 1_000_000).astype("datetime64[us]")

    return pa.Table.from_arrays(
        [
            pa.array(conv_id, type=pa.string()),
            pa.array(t.astype(np.int32)),
            pa.array(role, type=pa.string()),
            pa.array(text, type=pa.string()),
            pa.array(tool, type=pa.string()),
            pa.array(ts),
        ],
        schema=TRANSCRIPT_SCHEMA,
    )


def transcripts_for_tier(tier: str, *, skew: bool = False) -> pa.Table:
    n, base, mod = TIERS[tier]
    return make_transcripts(n, base, mod, skew=skew)


def transcripts_sql(tier: str, *, skew: bool = False) -> str:
    """DuckDB query generating the identical transcript table in SQL."""
    n, base, mod = TIERS[tier]
    tool_expr = (
        f"CASE WHEN (c*31 + t) % 10 != 0 THEN 'search' "
        f"ELSE ['search','python','browser','sql'][CAST((c*31 + t) % 4 AS INTEGER) + 1] END"
        if skew
        else "['search','python','browser','sql'][CAST((c*31 + t) % 4 AS INTEGER) + 1]"
    )
    return f"""
WITH turns AS (
  SELECT cs.range AS c, ts.range AS t
  FROM range(0, {n}) cs, range(0, {base + mod - 1}) ts
  WHERE ts.range < {base} + (cs.range % {mod})
)
SELECT
  printf('conv%08d', c) AS conv_id,
  CAST(t AS INTEGER) AS turn_idx,
  ['user','assistant','tool','assistant'][CAST(t % 4 AS INTEGER) + 1] AS role,
  printf('conv%08d-t%d-%s', c, t,
         ['user','assistant','tool','assistant'][CAST(t % 4 AS INTEGER) + 1]) AS text,
  CASE WHEN ['user','assistant','tool','assistant'][CAST(t % 4 AS INTEGER) + 1] = 'tool'
       THEN {tool_expr} ELSE NULL END AS tool,
  TIMESTAMP '2026-01-01 00:00:00' + INTERVAL 1 SECOND * (c*1000 + t) AS ts
FROM turns
""".strip()


def write_transcripts(path: str, tier: str, *, skew: bool = False) -> str:
    """Idempotently materialize a tier's transcripts as one parquet file."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if not os.path.exists(path):
        tmp = path + ".tmp"
        pq.write_table(transcripts_for_tier(tier, skew=skew), tmp)
        os.replace(tmp, path)
    return path


def default_transcripts_path(tier: str, *, skew: bool = False) -> str:
    suffix = "_skew" if skew else ""
    return f"/tmp/flashray/transcripts_{tier}{suffix}.parquet"


# ---------------------------------------------------------------------------
# Closed-form graph fixtures (FIXTURES.md §4). Directed edge arrays; the
# undirected fixtures list both directions explicitly.


def _both_dirs(pairs):
    src = [a for a, b in pairs] + [b for a, b in pairs]
    dst = [b for a, b in pairs] + [a for a, b in pairs]
    return np.asarray(src, dtype=np.int64), np.asarray(dst, dtype=np.int64)


def k3_edges():
    return _both_dirs([(0, 1), (1, 2), (0, 2)])


def cycle3_edges():
    return (
        np.asarray([0, 1, 2], dtype=np.int64),
        np.asarray([1, 2, 0], dtype=np.int64),
    )


def star_edges(k: int = 8):
    leaves = list(range(1, k + 1))
    return _both_dirs([(0, leaf) for leaf in leaves])


def two_components_edges():
    return _both_dirs([(0, 1), (1, 2), (10, 11)])


def path_edges(n: int = 5):
    return _both_dirs([(i, i + 1) for i in range(n - 1)])


def er_edges(n: int = 100, p: float = 0.05, seed: int = 42):
    """Seeded Erdős–Rényi, symmetric, no self loops."""
    rng = np.random.default_rng(seed)
    upper = rng.random((n, n)) < p
    upper = np.triu(upper, k=1)
    adj = upper | upper.T
    src, dst = np.nonzero(adj)
    return src.astype(np.int64), dst.astype(np.int64)


def edges_table(
    src: np.ndarray, dst: np.ndarray, weight: np.ndarray | None = None
) -> pa.Table:
    """Wrap fixture edge arrays in the EDGE_SCHEMA."""
    n = len(src)
    w = np.ones(n) if weight is None else np.asarray(weight, dtype=np.float64)
    return pa.Table.from_arrays(
        [
            pa.array(src),
            pa.array(dst),
            pa.array(["fix"] * n, type=pa.string()),
            pa.array(w),
            pa.array(np.full(n, EPOCH_US), type=pa.timestamp("us")),
        ],
        names=["src", "dst", "etype", "weight", "ts"],
    )
