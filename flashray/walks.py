"""Deterministic random walks over an edge Dataset — graph-structured
training-corpus generation (DeepWalk/node2vec-style: the walk corpus is the
input to skip-gram embedding training; Perozzi et al. KDD 2014).

RNG-free by construction: step t of walk w moves to the out-neighbor d
minimizing a hash of (salt, w, t, d). Deterministic across runs, block
layouts and parallelism; resumable (re-running a step recomputes the same
choice); and — with ``hash_fn="sha"`` — exactly reproducible in SQL (the
``random_walks_user`` driver oracle replays every step with a correlated
ORDER-BY-hash subquery inside a recursive CTE).

Dataflow per step (no per-walk Ray groups — the walk table is bucketed by
hash(walk_id) into ``num_buckets`` groups and each bucket chooses all its
walks' next hops in one vectorized pandas pass):

    frontier (walk_id, v) ⋈ edges on v = src   [one bucket-join shuffle]
      → candidates (walk_id, dst, priority)
      → per-bucket argmin (priority, dst) per walk_id
      → next frontier; rows (walk_id, step, vertex_id) appended

Walks that reach a vertex with no out-edges simply end (inner join drops
them) — matching the SQL oracle's EXISTS guard.

Scale notes: the per-step shuffle ships one row per (frontier walk ×
out-degree); ``hash_fn="splitmix"`` (default) keeps the priority pure
vectorized numpy. ``hash_fn="sha"`` pays one sha256 per candidate row and
exists for SQL-oracle parity — use splitmix at scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from flashray.ids import _splitmix64
from flashray.joins import bucket_hash_join

_C_STEP = np.uint64(0x9E3779B97F4A7C15)


def _priority(walk_id, step: int, dst, salt: str, hash_fn: str) -> np.ndarray:
    if hash_fn == "sha":
        from flashray.datapipe.sketches import _sha_u64

        return _sha_u64(
            [
                f"{salt}{int(w)}:{step}:{int(d)}"
                for w, d in zip(walk_id, dst)
            ]
        )
    w = np.asarray(walk_id).astype(np.uint64)
    d = np.asarray(dst).astype(np.uint64)
    s = np.uint64(step)
    with np.errstate(over="ignore"):
        h = _splitmix64(w + _C_STEP * (s + np.uint64(1)))
        return _splitmix64(h ^ d)


def random_walks(
    edges: ray.data.Dataset,
    *,
    walk_len: int,
    walks_per_vertex: int = 1,
    salt: str = "",
    num_buckets: int = 64,
    hash_fn: str = "splitmix",
    src_col: str = "src",
    dst_col: str = "dst",
) -> pd.DataFrame:
    """Generate ``walks_per_vertex`` deterministic walks of up to
    ``walk_len`` steps from every vertex. Returns rows
    (walk_id, step, vertex_id) sorted by (walk_id, step); walk_id =
    start_vertex × walks_per_vertex + j. The result is one row per visited
    position — write it to parquet for a training corpus instead of
    collecting when the graph is large."""
    I64 = pa.int64()
    e = edges.map_batches(
        lambda b: pa.table(
            {"src": b[src_col].cast(I64), "dst": b[dst_col].cast(I64)}
        ),
        batch_format="pyarrow",
    ).materialize()

    verts = np.unique(
        np.concatenate(
            [np.empty(0, dtype=np.int64)]
            + [
                np.concatenate(
                    [
                        b["src"].to_numpy(zero_copy_only=False),
                        b["dst"].to_numpy(zero_copy_only=False),
                    ]
                )
                for b in e.iter_batches(batch_format="pyarrow", batch_size=65536)
            ]
        )
    )
    wpv = int(walks_per_vertex)
    walk_id = np.repeat(verts, wpv) * wpv + np.tile(np.arange(wpv), len(verts))
    frontier = ray.data.from_arrow(
        pa.table(
            {
                "walk_id": pa.array(walk_id, type=I64),
                "v": pa.array(np.repeat(verts, wpv), type=I64),
            }
        )
    ).materialize()
    out = [
        pd.DataFrame(
            {
                "walk_id": walk_id,
                "step": np.zeros(len(walk_id), dtype=np.int64),
                "vertex_id": np.repeat(verts, wpv),
            }
        )
    ]

    fr_schema = pa.schema([("walk_id", I64), ("v", I64)])
    e_schema = pa.schema([("src", I64), ("dst", I64)])

    for t in range(1, int(walk_len) + 1):
        cand = bucket_hash_join(
            frontier,
            e,
            ["v"],
            right_on=["src"],
            num_buckets=num_buckets,
            left_schema=fr_schema,
            right_schema=e_schema,
        )

        def bucketize(b: pa.Table) -> pa.Table:
            w = b["walk_id"].to_numpy(zero_copy_only=False)
            return b.append_column(
                "__wbucket",
                pa.array((w % num_buckets).astype(np.int64)),
            )

        def choose(g: pd.DataFrame, _t=t) -> pd.DataFrame:
            # all candidates of a walk are in this bucket: argmin
            # (priority, dst) per walk, vectorized via one sort
            pri = _priority(
                g["walk_id"].to_numpy(), _t, g["dst"].to_numpy(), salt, hash_fn
            )
            g = g.assign(__pri=pri).sort_values(
                ["walk_id", "__pri", "dst"], kind="stable"
            )
            top = g.drop_duplicates("walk_id")
            return pd.DataFrame(
                {
                    "walk_id": top["walk_id"].to_numpy(),
                    "v": top["dst"].to_numpy(),
                }
            )

        frontier = (
            cand.map_batches(bucketize, batch_format="pyarrow")
            .groupby("__wbucket")
            .map_groups(choose, batch_format="pandas")
            .materialize()
        )
        step_df = frontier.to_pandas()
        if not len(step_df):
            break
        out.append(
            pd.DataFrame(
                {
                    "walk_id": step_df["walk_id"].astype(np.int64),
                    "step": np.full(len(step_df), t, dtype=np.int64),
                    "vertex_id": step_df["v"].astype(np.int64),
                }
            )
        )

    return (
        pd.concat(out, ignore_index=True)
        .sort_values(["walk_id", "step"])
        .reset_index(drop=True)
    )


def _alpha_weights(p: float, q: float, scale: int = 1_000_000) -> tuple[int, int, int]:
    """node2vec bias factors as exact integers (so the cumulative-sum
    inversion is integer math, bit-identical in numpy and SQL):
    return = round(scale/p), in-triangle = scale, outward = round(scale/q)."""
    return int(round(scale / float(p))), int(scale), int(round(scale / float(q)))


def _bias_u(walk_id: np.ndarray, step: int, salt: str, hash_fn: str) -> np.ndarray:
    """Per-(walk, step) uniform draw for the weighted choice, as uint64."""
    if hash_fn == "sha":
        from flashray.datapipe.sketches import _sha_u64

        return _sha_u64([f"{salt}{int(w)}:{step}" for w in walk_id])
    w = np.asarray(walk_id).astype(np.uint64)
    with np.errstate(over="ignore"):
        return _splitmix64(
            _splitmix64(w + _C_STEP * np.uint64(step + 1)) ^ _C_BIAS
        )


_C_BIAS = np.uint64(0xBF58476D1CE4E5B9)


def node2vec_walks(
    edges: ray.data.Dataset,
    *,
    walk_len: int,
    p: float = 1.0,
    q: float = 1.0,
    walks_per_vertex: int = 1,
    salt: str = "",
    num_buckets: int = 64,
    hash_fn: str = "splitmix",
    src_col: str = "src",
    dst_col: str = "dst",
    weight_scale: int = 1_000_000,
) -> pd.DataFrame:
    """node2vec biased second-order walks (Grover & Leskovec, KDD 2016):
    from ``v`` (arrived via ``prev``), candidate ``d`` is weighted
    1/p if d == prev, 1 if (prev, d) is an edge, else 1/q. Deterministic,
    RNG-free: the step-t draw for walk w is hash(salt, w, t) and the next
    hop is the first candidate (ascending d) whose integer cumulative
    weight exceeds draw % total — exactly reproducible in SQL with a
    windowed SUM over the same integer weights (driver oracle
    ``node2vec_walks_user``). Step 1 has no ``prev`` and is the uniform
    argmin-hash rule of :func:`random_walks`.

    The second-order flag needs "is d a neighbor of prev" — normally an
    edge-set join per step. This implementation avoids it: the PREVIOUS
    step's candidate set for walk w is exactly N(prev), so the flag is a
    per-bucket merge of two consecutive candidate sets, both already
    bucketed by hash(walk_id). Per step: one bucket-join shuffle
    (frontier x edges) + one bucket groupby over cand_t ∪ cand_{t-1}.

    ``edges`` must be duplicate-free — repeated (src, dst) rows would
    double that candidate's weight. Returns (walk_id, step, vertex_id)
    like :func:`random_walks`."""
    wp, wc, wq = _alpha_weights(p, q, weight_scale)
    I64 = pa.int64()
    e = edges.map_batches(
        lambda b: pa.table(
            {"src": b[src_col].cast(I64), "dst": b[dst_col].cast(I64)}
        ),
        batch_format="pyarrow",
    ).materialize()

    verts = np.unique(
        np.concatenate(
            [np.empty(0, dtype=np.int64)]
            + [
                np.concatenate(
                    [
                        b["src"].to_numpy(zero_copy_only=False),
                        b["dst"].to_numpy(zero_copy_only=False),
                    ]
                )
                for b in e.iter_batches(batch_format="pyarrow", batch_size=65536)
            ]
        )
    )
    wpv = int(walks_per_vertex)
    walk_id = np.repeat(verts, wpv) * wpv + np.tile(np.arange(wpv), len(verts))
    start_v = np.repeat(verts, wpv)
    frontier = ray.data.from_arrow(
        pa.table(
            {
                "walk_id": pa.array(walk_id, type=I64),
                "prev": pa.array(np.full(len(walk_id), -1), type=I64),
                "v": pa.array(start_v, type=I64),
            }
        )
    ).materialize()
    out = [
        pd.DataFrame(
            {
                "walk_id": walk_id,
                "step": np.zeros(len(walk_id), dtype=np.int64),
                "vertex_id": start_v,
            }
        )
    ]

    fr_schema = pa.schema([("walk_id", I64), ("prev", I64), ("v", I64)])
    e_schema = pa.schema([("src", I64), ("dst", I64)])
    prev_cand: ray.data.Dataset | None = None

    def bucketize(side: int):
        def fn(b: pa.Table) -> pa.Table:
            w = b["walk_id"].to_numpy(zero_copy_only=False)
            cols = {
                "walk_id": b["walk_id"].cast(I64),
                "prev": (
                    b["prev"].cast(I64)
                    if "prev" in b.column_names
                    else pa.array(np.zeros(b.num_rows, dtype=np.int64))
                ),
                "v": (
                    b["v"].cast(I64)
                    if "v" in b.column_names
                    else pa.array(np.zeros(b.num_rows, dtype=np.int64))
                ),
                "dst": b["dst"].cast(I64),
                "__wbucket": pa.array((w % num_buckets).astype(np.int64)),
                "__side": pa.array(
                    np.full(b.num_rows, side, dtype=np.int64)
                ),
            }
            return pa.table(cols)

        return fn

    _empty = pd.DataFrame(
        {
            "walk_id": pd.Series(dtype=np.int64),
            "prev": pd.Series(dtype=np.int64),
            "v": pd.Series(dtype=np.int64),
        }
    )

    for t in range(1, int(walk_len) + 1):
        cand = bucket_hash_join(
            frontier,
            e,
            ["v"],
            right_on=["src"],
            num_buckets=num_buckets,
            left_schema=fr_schema,
            right_schema=e_schema,
        ).map_batches(bucketize(0), batch_format="pyarrow").materialize()

        if t == 1:

            def choose_first(g: pd.DataFrame, _t=t) -> pd.DataFrame:
                if not len(g):
                    return _empty.copy()
                pri = _priority(
                    g["walk_id"].to_numpy(), _t, g["dst"].to_numpy(),
                    salt, hash_fn,
                )
                g = g.assign(__pri=pri).sort_values(
                    ["walk_id", "__pri", "dst"], kind="stable"
                )
                top = g.drop_duplicates("walk_id")
                return pd.DataFrame(
                    {
                        "walk_id": top["walk_id"].to_numpy(),
                        "prev": top["v"].to_numpy(),
                        "v": top["dst"].to_numpy(),
                    }
                )

            frontier = (
                cand.groupby("__wbucket")
                .map_groups(choose_first, batch_format="pandas")
                .materialize()
            )
        else:

            def choose_biased(g: pd.DataFrame, _t=t) -> pd.DataFrame:
                cur = g[g["__side"] == 0]
                if not len(cur):
                    return _empty.copy()
                pcs = (
                    g[g["__side"] == 1][["walk_id", "dst"]]
                    .drop_duplicates()
                    .assign(__nbr=np.int64(1))
                )
                m = cur.merge(pcs, on=["walk_id", "dst"], how="left")
                w = np.full(len(m), wq, dtype=np.int64)
                w[m["__nbr"].notna().to_numpy()] = wc
                w[m["dst"].to_numpy() == m["prev"].to_numpy()] = wp
                m = m.assign(__w=w).sort_values(
                    ["walk_id", "dst"], kind="stable"
                )
                grp = m.groupby("walk_id", sort=False)["__w"]
                cum = grp.cumsum().to_numpy()
                tot = grp.transform("sum").to_numpy()
                u = (
                    _bias_u(m["walk_id"].to_numpy(), _t, salt, hash_fn)
                    % tot.astype(np.uint64)
                ).astype(np.int64)
                sel = m[cum > u].drop_duplicates("walk_id")
                return pd.DataFrame(
                    {
                        "walk_id": sel["walk_id"].to_numpy(),
                        "prev": sel["v"].to_numpy(),
                        "v": sel["dst"].to_numpy(),
                    }
                )

            frontier = (
                cand.union(prev_cand)
                .groupby("__wbucket")
                .map_groups(choose_biased, batch_format="pandas")
                .materialize()
            )

        prev_cand = cand.map_batches(
            lambda b: pa.table(
                {
                    "walk_id": b["walk_id"],
                    "prev": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
                    "v": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
                    "dst": b["dst"],
                    "__wbucket": b["__wbucket"],
                    "__side": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

        step_df = frontier.to_pandas()
        if not len(step_df):
            break
        out.append(
            pd.DataFrame(
                {
                    "walk_id": step_df["walk_id"].astype(np.int64),
                    "step": np.full(len(step_df), t, dtype=np.int64),
                    "vertex_id": step_df["v"].astype(np.int64),
                }
            )
        )

    return (
        pd.concat(out, ignore_index=True)
        .sort_values(["walk_id", "step"])
        .reset_index(drop=True)
    )


def skipgram_pairs(
    corpus,
    *,
    window: int,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """(center, context, n) co-occurrence pairs from a walk corpus — the
    skip-gram training set for DeepWalk/node2vec embeddings: every ordered
    pair of positions within ``window`` steps on the same walk, counted.

    One bucket pass: walks are hash-bucketed (a walk's rows co-locate),
    pairs are ``window`` vectorized self-merges per bucket (never a Ray
    group per walk), then one bucketed count aggregate."""
    from flashray.joins import bucket_group_agg

    ds = (
        ray.data.from_pandas(corpus)
        if isinstance(corpus, pd.DataFrame)
        else corpus
    )

    def bucketize(b: pa.Table) -> pa.Table:
        w = b["walk_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "walk_id": b["walk_id"].cast(pa.int64()),
                "step": b["step"].cast(pa.int64()),
                "vertex_id": b["vertex_id"].cast(pa.int64()),
                "__wbucket": pa.array((w % num_buckets).astype(np.int64)),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        base = g[["walk_id", "step", "vertex_id"]]
        out = []
        for d in range(1, window + 1):
            shifted = base.assign(step=base["step"] + d)
            m = shifted.merge(
                base, on=["walk_id", "step"], suffixes=("_a", "_b")
            )
            if len(m):
                # a sits d steps BEFORE b: emit both directions
                out.append(
                    pd.DataFrame(
                        {
                            "center": m["vertex_id_a"].to_numpy(),
                            "context": m["vertex_id_b"].to_numpy(),
                        }
                    )
                )
                out.append(
                    pd.DataFrame(
                        {
                            "center": m["vertex_id_b"].to_numpy(),
                            "context": m["vertex_id_a"].to_numpy(),
                        }
                    )
                )
        if not out:
            return pd.DataFrame(
                {
                    "center": pd.Series(dtype=np.int64),
                    "context": pd.Series(dtype=np.int64),
                    "__one": pd.Series(dtype=np.int64),
                }
            )
        res = pd.concat(out, ignore_index=True)
        res["__one"] = np.ones(len(res), dtype=np.int64)
        return res

    prs = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__wbucket")
        .map_groups(pairs, batch_format="pandas")
    )
    agg = bucket_group_agg(
        prs,
        ["center", "context"],
        {"n": ("__one", "sum")},
        num_buckets=num_buckets,
    )
    df = agg.to_pandas()
    df["n"] = df["n"].astype(np.int64)
    return (
        df.sort_values(["center", "context"])
        .reset_index(drop=True)
    )
