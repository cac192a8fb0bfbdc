"""Triangle counting + scan statistics as a Ray Data wedge-join dataflow.

Reference: ``libgraph-algs/undirected_triangle_graph.cpp`` —
``compute_undirected_triangles`` (SURVEY.md §2.2 A5): the reference fetches
neighbors' adjacency lists via async SSD random access (E9
``request_vertices``); with no remote random access in Ray Data, the
neighborhood-intersection is restructured as a join (SURVEY.md §2.1 E9):

1. canonical undirected edges (one row per edge; for a symmetrized graph a
   plain ``src < dst`` filter — no shuffle),
2. degree-orient each edge low→high by (degree, id) — bounds each vertex's
   oriented out-degree by the graph degeneracy, so super-hubs do not
   explode the wedge count (the reference's degree-ordering trick),
3. wedges: every pair (b1, b2) in a center's oriented adjacency, generated
   fully vectorized (flashray.joins.pairs_within_groups — no per-group
   Python),
4. close wedges against the oriented edge set on the id-canonical pair key;
   every match is one triangle, counted exactly once (the center is the
   (deg,id)-smallest member).

Joins use flashray.joins.bucket_hash_join (single groupby shuffle per join,
vectorized pandas merge per bucket) — Ray 2.49's Dataset.join aggregator
pool starves small CPU sessions.

Scan statistics (A7/A8, ``libgraph-algs/local_scan_graph.cpp`` /
``topK_scan_graph.cpp``): scan1(v) = deg(v) + triangles(v) = edge count in
the closed 1-hop neighborhood; top-k = sort + limit over the scan vector.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

from flashray.build import Graph
from flashray.joins import bucket_hash_join, pairs_within_groups


def _canonical_undirected(graph: Graph) -> ray.data.Dataset:
    """One row per undirected edge (lo, hi), self-loops dropped."""
    edges = graph.edges_dataset(columns=["src", "dst"])

    def canon(b: pa.Table) -> pa.Table:
        src = b["src"].to_numpy(zero_copy_only=False)
        dst = b["dst"].to_numpy(zero_copy_only=False)
        if graph.meta.symmetrized:
            # both directions present exactly once per etype -> src < dst
            m = src < dst
            return pa.table({"lo": src[m], "hi": dst[m]})
        m = src != dst
        return pa.table(
            {"lo": np.minimum(src[m], dst[m]), "hi": np.maximum(src[m], dst[m])}
        )

    out = edges.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
    # the build dedups on (src, dst, etype): a pair connected by TWO etypes
    # would yield a duplicate (lo, hi) row and double-count wedges — dedup
    # in both branches (symmetrized included). This is a full shuffle, so
    # callers that consume the result twice must materialize it (a lazy
    # Dataset re-executes its whole upstream per consumer).
    from flashray.joins import bucket_group_agg

    return bucket_group_agg(out, ["lo", "hi"], None)


def _deg_from_und(und: ray.data.Dataset) -> ray.data.Dataset:
    """(vertex_id, deg) counted directly from a canonical edge Dataset."""

    def expand(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vertex_id": np.concatenate([lo, hi]),
                "deg": np.ones(2 * len(lo), dtype=np.int64),
            }
        )

    from flashray.joins import bucket_group_agg

    return bucket_group_agg(
        und.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True),
        ["vertex_id"],
        {"deg": ("deg", "sum")},
    )


def _degree_table(graph: Graph, und: ray.data.Dataset) -> ray.data.Dataset:
    """(vertex_id, deg) with deg = undirected degree."""
    if graph.meta.symmetrized:
        ds = graph.vertices_dataset(columns=["vertex_id", "out_degree"])
        return ds.map_batches(
            lambda b: b.rename_columns(
                ["deg" if c == "out_degree" else c for c in b.column_names]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    return _deg_from_und(und)


BROADCAST_VERTEX_LIMIT = 20_000_000  # ~240 MB of (id, deg) arrays


def _oriented_edges(graph: Graph, num_buckets: int) -> ray.data.Dataset:
    """Degree-orient canonical edges: a -> b iff (deg(a), a) < (deg(b), b)."""
    und = _canonical_undirected(graph)
    if not graph.meta.symmetrized:
        # the directed branch consumes und twice (degree count + orient):
        # pin the dedup-shuffle output so it executes once
        und = und.materialize()
    deg = _degree_table(graph, und)
    return _orient_und(und, deg, graph.meta.num_vertices, num_buckets)


def _orient_und(
    und: ray.data.Dataset,
    deg: ray.data.Dataset,
    num_vertices: int,
    num_buckets: int,
) -> ray.data.Dataset:
    """Orientation core, graph-independent (k-truss re-runs it per peel
    round on a shrinking edge set).

    Small-side optimization: when the vertex table fits comfortably in the
    object store, broadcast (sorted ids, degrees) once and orient with a
    vectorized searchsorted per batch — no join shuffles. The partitioned
    hash-join path remains for vertex tables beyond the broadcast limit."""
    if num_vertices <= BROADCAST_VERTEX_LIMIT:
        import ray as _ray

        dpd = deg.to_pandas()
        order = np.argsort(dpd["vertex_id"].to_numpy())
        ids_ref = _ray.put(dpd["vertex_id"].to_numpy()[order])
        deg_ref = _ray.put(dpd["deg"].to_numpy()[order])

        def orient_bcast(b: pa.Table) -> pa.Table:
            ids = _ray.get(ids_ref)
            dg = _ray.get(deg_ref)
            lo = b["lo"].to_numpy(zero_copy_only=False)
            hi = b["hi"].to_numpy(zero_copy_only=False)
            dlo = dg[np.searchsorted(ids, lo)]
            dhi = dg[np.searchsorted(ids, hi)]
            lo_first = (dlo < dhi) | ((dlo == dhi) & (lo < hi))
            return pa.table(
                {
                    "a": np.where(lo_first, lo, hi),
                    "b": np.where(lo_first, hi, lo),
                }
            )

        return und.map_batches(
            orient_bcast, batch_format="pyarrow", zero_copy_batch=True
        )

    I64 = pa.int64()
    j = bucket_hash_join(
        und, deg, ["lo"], right_on=["vertex_id"], num_buckets=num_buckets,
        left_schema=pa.schema([("lo", I64), ("hi", I64)]),
        right_schema=pa.schema([("vertex_id", I64), ("deg", I64)]),
    )
    # columns now: lo, hi, deg  (deg of lo)
    j = j.map_batches(
        lambda b: b.rename_columns(
            ["deg_lo" if c == "deg" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
    j = bucket_hash_join(
        j, deg, ["hi"], right_on=["vertex_id"], num_buckets=num_buckets,
        left_schema=pa.schema([("lo", I64), ("hi", I64), ("deg_lo", I64)]),
        right_schema=pa.schema([("vertex_id", I64), ("deg", I64)]),
    )

    def orient(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        dlo = b["deg_lo"].to_numpy(zero_copy_only=False)
        dhi = b["deg"].to_numpy(zero_copy_only=False)
        lo_first = (dlo < dhi) | ((dlo == dhi) & (lo < hi))
        return pa.table(
            {
                "a": np.where(lo_first, lo, hi),
                "b": np.where(lo_first, hi, lo),
            }
        )

    return j.map_batches(orient, batch_format="pyarrow")


# Hybrid routing (the duplicate_groups/broadcast-orientation pattern):
# wedge dataflows cost a fixed ~4 all-to-alls regardless of size, pure
# latency on small graphs; below this edge count the SAME
# orient/wedge/close rule runs as one vectorized in-process kernel.
# graph.meta.num_edges (>= canonical rows) gates it without extra passes.
LOCAL_EDGE_THRESHOLD = 200_000


def _local_closed_wedges(
    lo: np.ndarray, hi: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Closed wedges of a deduped canonical edge set, vectorized
    in-process — the exact local mirror of _orient_und +
    _closed_from_oriented (same degree orientation, same
    pairs_within_groups wedge enumeration, same closing-edge probe).
    Returns (w1, w2, center) with w1 < w2, original vertex ids."""
    lo = np.asarray(lo, dtype=np.int64)
    hi = np.asarray(hi, dtype=np.int64)
    ne = len(lo)
    if ne == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    ids = np.unique(np.concatenate([lo, hi]))
    nv = len(ids)
    clo = np.searchsorted(ids, lo)
    chi = np.searchsorted(ids, hi)
    deg = np.bincount(np.concatenate([clo, chi]), minlength=nv)
    dlo, dhi = deg[clo], deg[chi]
    # code comparison == id comparison (searchsorted is monotonic)
    lo_first = (dlo < dhi) | ((dlo == dhi) & (clo < chi))
    a = np.where(lo_first, clo, chi)
    b = np.where(lo_first, chi, clo)
    order = np.lexsort((b, a))
    w1, w2, center = pairs_within_groups(a[order], b[order])
    ekey = np.sort(np.minimum(clo, chi) * nv + np.maximum(clo, chi))
    wkey = np.minimum(w1, w2) * nv + np.maximum(w1, w2)
    pos = np.searchsorted(ekey, wkey)
    closed = (pos < ne) & (ekey[np.minimum(pos, ne - 1)] == wkey)
    return ids[w1[closed]], ids[w2[closed]], ids[center[closed]]


def _local_und_pdf(graph: Graph) -> pd.DataFrame:
    return _canonical_undirected(graph).to_pandas()


def _local_deg_pdf(graph: Graph, und: pd.DataFrame) -> pd.DataFrame:
    """Local mirror of _degree_table (same source columns)."""
    if graph.meta.symmetrized:
        d = graph.vertices_dataset(
            columns=["vertex_id", "out_degree"]
        ).to_pandas()
        return d.rename(columns={"out_degree": "deg"})
    vid, cnt = np.unique(
        np.concatenate([und["lo"].to_numpy(), und["hi"].to_numpy()]),
        return_counts=True,
    )
    return pd.DataFrame({"vertex_id": vid, "deg": cnt.astype(np.int64)})


def _local_tri_counts(und: pd.DataFrame) -> pd.DataFrame:
    w1, w2, c = _local_closed_wedges(
        und["lo"].to_numpy(), und["hi"].to_numpy()
    )
    vid, cnt = np.unique(np.concatenate([w1, w2, c]), return_counts=True)
    return pd.DataFrame(
        {"vertex_id": vid.astype(np.int64), "triangles": cnt.astype(np.int64)}
    )


# Below this many EDGES the oriented edge set broadcasts once as sorted
# arrays (ids, CSR offsets, adjacency, canonical edge keys — ~40 B/edge)
# and the wedge expansion + closing-edge probe run SHUFFLE-FREE inside
# map_batches (the walks.py CSR-broadcast idiom): the two all-to-alls of
# the join dataflow (wedge groupby + closure join) disappear, and the
# O(Σ deg²)-bounded wedge work stays distributed across the actor pool —
# unlike LOCAL_EDGE_THRESHOLD's single-threaded kernel. Above the limit
# the partitioned join dataflow is unchanged.
BROADCAST_CSR_EDGE_LIMIT = 20_000_000


def _closed_wedges(graph: Graph, num_buckets: int) -> ray.data.Dataset:
    # oriented feeds BOTH the wedge expansion and the closing-edge probe;
    # materialize so the canonical-dedup shuffle (+ orientation joins on
    # the huge-graph path) executes once, not once per consumer. Cost:
    # E × 16 B of (a, b) int64 pairs in the object store (spillable) —
    # far cheaper than re-running a full shuffle at 100× scale.
    oriented = _oriented_edges(graph, num_buckets).materialize()
    if graph.meta.num_edges <= BROADCAST_CSR_EDGE_LIMIT:
        return _closed_from_oriented_broadcast(oriented)
    return _closed_from_oriented(oriented, num_buckets)


def _closed_from_oriented_broadcast(
    oriented: ray.data.Dataset,
) -> ray.data.Dataset:
    """Shuffle-free closed-wedge pass: collapse the (already materialized)
    oriented edge set once, broadcast (sorted-by-(a,b) arrays + canonical
    edge keys) via ray.put, then map over the SAME oriented blocks — each
    edge (a, b) pairs b with every LATER out-neighbor c of a (sorted
    adjacency ⇒ each unordered pair once, w1 < w2 by construction), and
    the closing probe is one searchsorted into the broadcast key array.
    Output schema/rows identical to _closed_from_oriented."""
    opd = oriented.to_pandas()
    a0 = opd["a"].to_numpy(dtype=np.int64)
    b0 = opd["b"].to_numpy(dtype=np.int64)
    if not len(a0):
        return ray.data.from_arrow(
            pa.table(
                {
                    "w1": pa.array([], type=pa.int64()),
                    "w2": pa.array([], type=pa.int64()),
                    "center": pa.array([], type=pa.int64()),
                }
            )
        )
    ids = np.unique(np.concatenate([a0, b0]))
    nv = len(ids)
    ca = np.searchsorted(ids, a0)
    cb = np.searchsorted(ids, b0)
    order = np.lexsort((cb, ca))
    ca_s, cb_s = ca[order], cb[order]
    indptr = np.searchsorted(ca_s, np.arange(nv + 1))
    edge_sorted = ca_s * nv + cb_s  # ascending (lexsort)
    ekey = np.sort(
        np.minimum(ca_s, cb_s) * nv + np.maximum(ca_s, cb_s)
    )
    ref = ray.put((ids, indptr, cb_s, edge_sorted, ekey, nv))

    def probe(batch: pa.Table) -> pa.Table:
        import ray as _ray

        ids_, indptr_, adj, es_, ek_, nv_ = _ray.get(ref)
        aa = np.searchsorted(ids_, batch["a"].to_numpy(zero_copy_only=False))
        bb = np.searchsorted(ids_, batch["b"].to_numpy(zero_copy_only=False))
        # this edge's global position in the (a, b)-sorted order; partners
        # are the strictly-later out-neighbors of a
        pos = np.searchsorted(es_, aa * nv_ + bb)
        starts = pos + 1
        ends = indptr_[aa + 1]
        n = ends - starts
        total = int(n.sum())
        if total == 0:
            return pa.table(
                {
                    "w1": pa.array([], type=pa.int64()),
                    "w2": pa.array([], type=pa.int64()),
                    "center": pa.array([], type=pa.int64()),
                }
            )
        gidx = np.repeat(np.arange(len(aa)), n)
        off = np.concatenate([[0], np.cumsum(n)[:-1]])
        flat = np.arange(total) - off[gidx] + starts[gidx]
        w1 = np.repeat(bb, n)  # adj sorted ascending ⇒ w1 < w2
        w2 = adj[flat]
        center = np.repeat(aa, n)
        wkey = w1 * nv_ + w2
        p = np.searchsorted(ek_, wkey)
        closed = (p < len(ek_)) & (ek_[np.minimum(p, len(ek_) - 1)] == wkey)
        return pa.table(
            {
                "w1": pa.array(ids_[w1[closed]]),
                "w2": pa.array(ids_[w2[closed]]),
                "center": pa.array(ids_[center[closed]]),
            }
        )

    return oriented.map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True
    )


def _closed_from_oriented(
    oriented: ray.data.Dataset, num_buckets: int
) -> ray.data.Dataset:
    def bucket_by_center(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "cbucket", pa.array((a % num_buckets).astype(np.int64))
        )

    def wedges_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["b"].to_numpy(), g["a"].to_numpy()))
        a = g["a"].to_numpy()[order]
        b = g["b"].to_numpy()[order]
        w1, w2, center = pairs_within_groups(a, b)
        return pd.DataFrame({"w1": w1, "w2": w2, "center": center})

    wedges = (
        oriented.map_batches(
            bucket_by_center, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("cbucket")
        .map_groups(wedges_of_bucket, batch_format="pandas")
    )

    def okey(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        return pa.table({"w1": np.minimum(a, bb), "w2": np.maximum(a, bb)})

    closing = oriented.map_batches(okey, batch_format="pyarrow")
    I64 = pa.int64()
    return bucket_hash_join(
        wedges, closing, ["w1", "w2"], num_buckets=num_buckets,
        left_schema=pa.schema([("w1", I64), ("w2", I64), ("center", I64)]),
        right_schema=pa.schema([("w1", I64), ("w2", I64)]),
    )


def triangles(
    graph: Graph,
    *,
    num_buckets: int | None = None,
    local_threshold: int | None = LOCAL_EDGE_THRESHOLD,
) -> ray.data.Dataset:
    """Per-vertex triangle counts: Dataset (vertex_id, triangles). Vertices
    in no triangle are absent (left-join the vertex table for zeros).
    Below ``local_threshold`` edges the wedge pass runs in-process
    (see LOCAL_EDGE_THRESHOLD); 0/None forces the distributed dataflow."""
    if local_threshold and graph.meta.num_edges <= local_threshold:
        return ray.data.from_pandas(_local_tri_counts(_local_und_pdf(graph)))
    B = num_buckets or max(16, graph.num_partitions)
    closed = _closed_wedges(graph, B)

    def to_members(b: pa.Table) -> pa.Table:
        w1 = b["w1"].to_numpy(zero_copy_only=False)
        w2 = b["w2"].to_numpy(zero_copy_only=False)
        c = b["center"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vertex_id": np.concatenate([w1, w2, c]),
                "triangles": np.ones(3 * len(c), dtype=np.int64),
            }
        )

    from flashray.joins import bucket_group_agg

    return bucket_group_agg(
        closed.map_batches(to_members, batch_format="pyarrow", zero_copy_batch=True),
        ["vertex_id"],
        {"triangles": ("triangles", "sum")},
    )


def edge_support(
    graph: Graph,
    *,
    num_buckets: int | None = None,
    include_zero: bool = True,
    local_threshold: int | None = LOCAL_EDGE_THRESHOLD,
) -> ray.data.Dataset:
    """Per-EDGE triangle support (the k-truss quantity): for every
    undirected edge (lo, hi), the number of triangles containing it.
    Each closed wedge contributes its three member edges; one bucketed
    sum. ``include_zero`` left-joins the canonical edge set so
    triangle-free edges appear with support 0. Below ``local_threshold``
    edges the pass runs in-process (see LOCAL_EDGE_THRESHOLD)."""
    if local_threshold and graph.meta.num_edges <= local_threshold:
        und = _local_und_pdf(graph)
        lo = und["lo"].to_numpy()
        hi = und["hi"].to_numpy()
        w1, w2, c = _local_closed_wedges(lo, hi)
        mlo = np.concatenate([w1, np.minimum(c, w1), np.minimum(c, w2)])
        mhi = np.concatenate([w2, np.maximum(c, w1), np.maximum(c, w2)])
        sup_df = (
            pd.DataFrame({"lo": mlo, "hi": mhi})
            .groupby(["lo", "hi"])
            .size()
            .rename("support")
            .reset_index()
        )
        if include_zero:
            sup_df = und.merge(sup_df, on=["lo", "hi"], how="left")
            sup_df["support"] = sup_df["support"].fillna(0)
        return ray.data.from_pandas(
            sup_df.astype(
                {"lo": "int64", "hi": "int64", "support": "int64"}
            )
        )
    B = num_buckets or max(16, graph.num_partitions)
    closed = _closed_wedges(graph, B)
    sup = _support_from_closed(closed, B)
    if not include_zero:
        return sup
    return _support_with_zeros(_canonical_undirected(graph), sup, B)


def _support_from_closed(
    closed: ray.data.Dataset, num_buckets: int
) -> ray.data.Dataset:
    def to_edges(b: pa.Table) -> pa.Table:
        w1 = b["w1"].to_numpy(zero_copy_only=False)
        w2 = b["w2"].to_numpy(zero_copy_only=False)
        c = b["center"].to_numpy(zero_copy_only=False)
        lo = np.concatenate([w1, np.minimum(c, w1), np.minimum(c, w2)])
        hi = np.concatenate([w2, np.maximum(c, w1), np.maximum(c, w2)])
        return pa.table(
            {
                "lo": lo,
                "hi": hi,
                "support": np.ones(3 * len(c), dtype=np.int64),
            }
        )

    from flashray.joins import bucket_group_agg

    return bucket_group_agg(
        closed.map_batches(to_edges, batch_format="pyarrow", zero_copy_batch=True),
        ["lo", "hi"],
        {"support": ("support", "sum")},
        num_buckets=num_buckets,
    )


def _support_with_zeros(
    und: ray.data.Dataset, sup: ray.data.Dataset, num_buckets: int
) -> ray.data.Dataset:
    I64 = pa.int64()
    j = bucket_hash_join(
        und, sup, ["lo", "hi"], how="left", num_buckets=num_buckets,
        left_schema=pa.schema([("lo", I64), ("hi", I64)]),
        right_schema=pa.schema([("lo", I64), ("hi", I64), ("support", I64)]),
    )

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "lo": df["lo"].to_numpy().astype(np.int64),
                "hi": df["hi"].to_numpy().astype(np.int64),
                "support": df["support"]
                .fillna(0)
                .to_numpy()
                .astype(np.int64),
            }
        )

    return j.map_batches(fill, batch_format="pandas")


def _k_truss_local(
    lo: np.ndarray, hi: np.ndarray, thr: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized in-process peel — the distributed round's exact local
    mirror (same orientation rule, same wedge enumeration via
    pairs_within_groups, same support filter), run to the fixed point.
    Input: deduped canonical edges (lo < hi). Returns (lo, hi, support)."""
    lo = np.asarray(lo, dtype=np.int64)
    hi = np.asarray(hi, dtype=np.int64)
    while True:
        ne = len(lo)
        if ne == 0:
            z = np.zeros(0, dtype=np.int64)
            return z, z.copy(), z.copy()
        # compact codes: pair key = c1 * nv + c2 stays within int64
        ids = np.unique(np.concatenate([lo, hi]))
        nv = len(ids)
        clo = np.searchsorted(ids, lo)
        chi = np.searchsorted(ids, hi)
        deg = np.bincount(np.concatenate([clo, chi]), minlength=nv)
        dlo, dhi = deg[clo], deg[chi]
        lo_first = (dlo < dhi) | ((dlo == dhi) & (clo < chi))
        a = np.where(lo_first, clo, chi)
        b = np.where(lo_first, chi, clo)
        order = np.lexsort((b, a))
        w1, w2, center = pairs_within_groups(a[order], b[order])
        ckey = np.minimum(clo, chi) * nv + np.maximum(clo, chi)
        perm = np.argsort(ckey)
        ekey = ckey[perm]
        wkey = np.minimum(w1, w2) * nv + np.maximum(w1, w2)
        pos = np.searchsorted(ekey, wkey)
        closed = (pos < ne) & (ekey[np.minimum(pos, ne - 1)] == wkey)
        cw1, cw2, cc = w1[closed], w2[closed], center[closed]
        member = np.concatenate(
            [
                np.minimum(cw1, cw2) * nv + np.maximum(cw1, cw2),
                np.minimum(cc, cw1) * nv + np.maximum(cc, cw1),
                np.minimum(cc, cw2) * nv + np.maximum(cc, cw2),
            ]
        )
        sup_sorted = np.bincount(
            np.searchsorted(ekey, member), minlength=ne
        ).astype(np.int64)
        support = np.empty(ne, dtype=np.int64)
        support[perm] = sup_sorted
        keep = support >= thr
        if keep.all():
            return lo, hi, support
        lo, hi = lo[keep], hi[keep]


def k_truss(
    graph: Graph,
    k: int,
    *,
    num_buckets: int | None = None,
    max_rounds: int | None = None,
    local_threshold: int | None = 200_000,
) -> ray.data.Dataset:
    """The k-truss: the maximal subgraph in which every edge participates
    in at least k−2 triangles (support counted WITHIN the subgraph).
    Returns the surviving canonical edges as (lo, hi, support) with the
    final in-truss support; k >= 3.

    Iterative peeling: each round recomputes per-edge support on the
    current edge set (degrees, orientation and wedges all re-derived from
    the shrunken set — one wedge-join dataflow per round) and drops every
    edge below k−2, until a fixed point. Rounds are bounded by the peel
    depth of the graph, not |E|: each round removes all violating edges
    at once. ``max_rounds`` caps it for latency-sensitive callers (the
    result is then a truss SUPERSET, support values still exact for the
    returned edge set's last round).

    ``local_threshold``: peel-tail hybrid. Peeling is O(peel-depth)
    ROUNDS of multi-stage shuffles — pure round-trip latency once the
    survivor set is small — and at scale the set shrinks monotonically,
    so once the current edge count fits one worker the remaining rounds
    run as one vectorized in-process peel (:func:`_k_truss_local`, the
    exact same per-round rule) instead of paying
    O(stages × remaining_rounds) in shuffle latency. Set ``None`` (or 0)
    to force the distributed loop for every round."""
    if k < 3:
        raise ValueError("k-truss requires k >= 3")
    B = num_buckets or max(16, graph.num_partitions)
    nv = graph.meta.num_vertices
    thr = k - 2
    und = _canonical_undirected(graph).materialize()
    n = und.count()
    rounds = 0
    while True:
        if local_threshold and n <= local_threshold and max_rounds is None:
            pdf = und.to_pandas()
            lo, hi, sup = _k_truss_local(
                pdf["lo"].to_numpy(), pdf["hi"].to_numpy(), thr
            )
            return ray.data.from_arrow(
                pa.table(
                    {
                        "lo": pa.array(lo, pa.int64()),
                        "hi": pa.array(hi, pa.int64()),
                        "support": pa.array(sup, pa.int64()),
                    }
                )
            )
        deg = _deg_from_und(und)
        oriented = _orient_und(und, deg, nv, B).materialize()
        # NO zero-fill join here (unlike edge_support): thr = k-2 >= 1, so
        # an edge absent from the support table (support 0) is dropped by
        # the filter either way — skipping _support_with_zeros saves one
        # all-to-all per peel round
        supz = _support_from_closed(_closed_from_oriented(oriented, B), B)

        def keep(b: pa.Table) -> pa.Table:
            return b.filter(
                pa.array(b["support"].to_numpy(zero_copy_only=False) >= thr)
            )

        kept = (
            supz.map_batches(
                keep, batch_format="pyarrow", zero_copy_batch=True
            )
            # coalesce per round: every shuffle stage emits ~as many blocks
            # as it receives, so without this the block count compounds
            # per peel round and reduce-task dispatch dominates (measured:
            # 1,118 s for a 534-edge graph at 4 rounds; 8 s with the
            # repartition — the same pathology hyperball() hit)
            .repartition(B)
            .materialize()
        )
        m = kept.count()
        rounds += 1
        if m == n or m == 0 or (max_rounds is not None and rounds >= max_rounds):
            return kept
        und = kept.select_columns(["lo", "hi"])
        n = m


def triangle_count(
    graph: Graph,
    *,
    num_buckets: int | None = None,
    local_threshold: int | None = LOCAL_EDGE_THRESHOLD,
) -> int:
    """Global triangle count (each triangle once). Below
    ``local_threshold`` edges the wedge pass runs in-process."""
    if local_threshold and graph.meta.num_edges <= local_threshold:
        und = _local_und_pdf(graph)
        w1, _w2, _c = _local_closed_wedges(
            und["lo"].to_numpy(), und["hi"].to_numpy()
        )
        return int(len(w1))
    B = num_buckets or max(16, graph.num_partitions)
    return _closed_wedges(graph, B).count()


def directed_triangle_count(
    graph: Graph, *, num_buckets: int | None = None
) -> int:
    """A6 (libgraph-algs/triangle_graph.cpp — compute_directed_triangles):
    directed 3-cycles u→v→w→u, each counted once (u = cyclic minimum).

    Dataflow: paths u→v→w from a self-join of the (deduped) directed edge
    set on v, then a closure join against edges on (w, u). Bucketed hash
    joins as in the undirected case."""
    B = num_buckets or max(16, graph.num_partitions)
    edges = graph.edges_dataset(columns=["src", "dst"])

    def dedup_dir(b: pa.Table) -> pa.Table:
        src = b["src"].to_numpy(zero_copy_only=False)
        dst = b["dst"].to_numpy(zero_copy_only=False)
        m = src != dst
        return pa.table({"src": src[m], "dst": dst[m]})

    from flashray.joins import bucket_group_agg

    e = bucket_group_agg(
        edges.map_batches(dedup_dir, batch_format="pyarrow", zero_copy_batch=True),
        ["src", "dst"],
        None,
    )
    I64 = pa.int64()
    esch = pa.schema([("src", I64), ("dst", I64)])

    # paths u→v→w: join e (as u→v) with e (as v→w) on v
    paths = bucket_hash_join(
        e,
        e,
        ["dst"],
        right_on=["src"],
        num_buckets=B,
        left_schema=esch,
        right_schema=esch,
        suffixes=("", "_2"),
    )

    def clean(b: pa.Table) -> pa.Table:
        u = b["src"].to_numpy(zero_copy_only=False)
        w = b["dst_2"].to_numpy(zero_copy_only=False)
        # u is the cyclic minimum -> each 3-cycle counted exactly once
        m = (u != w) & (u < b["dst"].to_numpy(zero_copy_only=False)) & (u < w)
        return pa.table({"w": w[m], "u": u[m]})

    paths = paths.map_batches(clean, batch_format="pyarrow")
    closed = bucket_hash_join(
        paths,
        e,
        ["w", "u"],
        right_on=["src", "dst"],
        num_buckets=B,
        left_schema=pa.schema([("w", I64), ("u", I64)]),
        right_schema=esch,
    )
    return closed.count()


def scan_statistic(
    graph: Graph,
    *,
    num_buckets: int | None = None,
    local_threshold: int | None = LOCAL_EDGE_THRESHOLD,
) -> ray.data.Dataset:
    """A7: scan1(v) = deg(v) + triangles(v). Returns (vertex_id, scan).
    Below ``local_threshold`` edges the pass runs in-process."""
    if local_threshold and graph.meta.num_edges <= local_threshold:
        und = _local_und_pdf(graph)
        out = _local_deg_pdf(graph, und).merge(
            _local_tri_counts(und), on="vertex_id", how="left"
        )
        out["scan"] = out["deg"].astype(np.int64) + out[
            "triangles"
        ].fillna(0).astype(np.int64)
        return ray.data.from_pandas(
            out[["vertex_id", "scan"]].astype("int64")
        )
    B = num_buckets or max(16, graph.num_partitions)
    tri = triangles(graph, num_buckets=B, local_threshold=local_threshold)
    und = _canonical_undirected(graph)
    deg = _degree_table(graph, und)
    j = bucket_hash_join(
        deg,
        tri,
        ["vertex_id"],
        how="left",
        num_buckets=B,
        left_schema=pa.schema([("vertex_id", pa.int64()), ("deg", pa.int64())]),
        # triangles may be empty (triangle-free graph) -> schema unknowable
        right_schema=pa.schema(
            [("vertex_id", pa.int64()), ("triangles", pa.int64())]
        ),
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        t = b["triangles"].fillna(0).astype(np.int64)
        return pd.DataFrame(
            {"vertex_id": b["vertex_id"].astype(np.int64), "scan": b["deg"].astype(np.int64) + t}
        )

    return j.map_batches(finish, batch_format="pandas")


def topk_scan(graph: Graph, k: int = 10, *, num_buckets: int | None = None):
    """A8: the K highest scan-statistic vertices."""
    return scan_statistic(graph, num_buckets=num_buckets).sort(
        ["scan", "vertex_id"], descending=[True, False]
    ).limit(k)


def clustering_coefficient(
    graph: Graph,
    *,
    num_buckets: int | None = None,
    local_threshold: int | None = LOCAL_EDGE_THRESHOLD,
) -> ray.data.Dataset:
    """Local clustering coefficient per vertex:
    ``cc(v) = 2·triangles(v) / (deg(v)·(deg(v)−1))`` over the undirected
    (canonical, cross-etype-deduped) edge set; 0.0 for deg < 2.

    Derived from the same wedge-join dataflow as :func:`triangles` (A5) —
    no new shuffle shape; one extra left join of the degree table against
    the per-vertex triangle counts. Returns (vertex_id, deg, triangles,
    cc); every vertex with at least one undirected edge appears. Below
    ``local_threshold`` edges the pass runs in-process."""
    if local_threshold and graph.meta.num_edges <= local_threshold:
        und = _local_und_pdf(graph)
        out = _local_deg_pdf(graph, und).merge(
            _local_tri_counts(und), on="vertex_id", how="left"
        )
        d = out["deg"].to_numpy().astype(np.int64)
        t = out["triangles"].fillna(0).to_numpy().astype(np.int64)
        denom = (d * (d - 1)).astype(np.float64)
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "vertex_id": out["vertex_id"].astype(np.int64),
                    "deg": d,
                    "triangles": t,
                    "cc": np.where(
                        denom > 0, 2.0 * t / np.maximum(denom, 1.0), 0.0
                    ),
                }
            )
        )
    B = num_buckets or max(16, graph.num_partitions)
    tri = triangles(graph, num_buckets=B, local_threshold=local_threshold)
    und = _canonical_undirected(graph)
    deg = _degree_table(graph, und)
    j = bucket_hash_join(
        deg,
        tri,
        ["vertex_id"],
        how="left",
        num_buckets=B,
        left_schema=pa.schema([("vertex_id", pa.int64()), ("deg", pa.int64())]),
        right_schema=pa.schema(
            [("vertex_id", pa.int64()), ("triangles", pa.int64())]
        ),
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        d = b["deg"].to_numpy().astype(np.int64)
        t = b["triangles"].fillna(0).to_numpy().astype(np.int64)
        denom = (d * (d - 1)).astype(np.float64)
        cc = np.where(denom > 0, 2.0 * t / np.maximum(denom, 1.0), 0.0)
        return pd.DataFrame(
            {
                "vertex_id": b["vertex_id"].astype(np.int64),
                "deg": d,
                "triangles": t,
                "cc": cc,
            }
        )

    return j.map_batches(finish, batch_format="pandas")


def _pair_common_neighbors(
    und: ray.data.Dataset, B: int, max_center_degree: int | None
) -> ray.data.Dataset:
    """(u, v, cn, adamic_adar) for every distance-2 pair: full-adjacency
    wedges bucketed by center — deg(center) is the group run-length, so
    no degree join is needed. Shared by link prediction and butterfly
    counting."""

    def adjacency(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        center = np.concatenate([lo, hi])
        return pa.table(
            {
                "center": center,
                "nbr": np.concatenate([hi, lo]),
                "cbucket": (center % B).astype(np.int64),
            }
        )

    def wedge_scores(g: pd.DataFrame) -> pd.DataFrame:
        c = g["center"].to_numpy()
        n = g["nbr"].to_numpy()
        order = np.lexsort((n, c))
        c, n = c[order], n[order]
        uniq, counts = np.unique(c, return_counts=True)
        if max_center_degree is not None:
            keep = np.repeat(counts <= max_center_degree, counts)
            c, n = c[keep], n[keep]
            uniq, counts = np.unique(c, return_counts=True)
        u, v, center = pairs_within_groups(c, n)
        degc = counts[np.searchsorted(uniq, center)]
        return pd.DataFrame(
            {
                "u": u,
                "v": v,
                "cn1": np.ones(len(u), dtype=np.int64),
                "aa": 1.0 / np.log(degc),  # deg(center) >= 2 by construction
            }
        )

    from flashray.joins import bucket_group_agg

    return bucket_group_agg(
        und.map_batches(adjacency, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cbucket")
        .map_groups(wedge_scores, batch_format="pandas"),
        ["u", "v"],
        {"cn": ("cn1", "sum"), "adamic_adar": ("aa", "sum")},
        num_buckets=B,
    )


def butterfly_count(
    graph: Graph,
    *,
    max_center_degree: int | None = None,
    num_buckets: int | None = None,
) -> int:
    """Global butterfly (4-cycle) count: Σ over vertex pairs of
    C(common_neighbors, 2), halved — each 4-cycle has TWO diagonal pairs
    (u,w) and (x,y), so the pair sum counts every 4-cycle exactly twice.
    The standard bipartite-network cohesion metric (works on any graph; on
    a bipartite one every 4-cycle is a butterfly). Same wedge dataflow as
    link prediction; the final reduction streams one partial per block to
    the driver.

    With ``max_center_degree`` set the count is APPROXIMATE (a lower
    bound): wedges through pruned super-hub centers are skipped, and a
    4-cycle's two diagonal contributions can drop asymmetrically — the
    halved sum is then rounded half-up. With ``max_center_degree=None``
    the count is exact and the even-pair-sum invariant is asserted."""
    B = num_buckets or max(16, graph.num_partitions)
    und = _canonical_undirected(graph).materialize()
    pairs = _pair_common_neighbors(und, B, max_center_degree)

    def partial(b: pa.Table) -> pa.Table:
        cn = b["cn"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"bf": pa.array([int((cn * (cn - 1) // 2).sum())])})

    out = pairs.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).sum("bf")
    total = int(out or 0)
    # Exact mode: the pair sum counts each 4-cycle exactly twice, so it is
    # always even — assert rather than let floor-division hide a bug.
    # With max_center_degree pruning, the two diagonal contributions of a
    # 4-cycle can be dropped asymmetrically (odd total is legitimate);
    # round half-up and document the approximate regime in the docstring.
    if max_center_degree is None:
        if total % 2 != 0:
            raise AssertionError(
                f"exact butterfly pair-sum {total} is odd — "
                "diagonal-pair double-count invariant violated"
            )
        return total // 2
    return (total + 1) // 2


def link_prediction(
    graph: Graph,
    *,
    include_edges: bool = False,
    max_center_degree: int | None = None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Topological link-prediction scores for every vertex pair at
    distance 2: common neighbors, Jaccard, Adamic-Adar. Returns
    (u, v, cn, jaccard, adamic_adar, pref_attach) with u < v — the four
    classic Liben-Nowell/Kleinberg predictors (preferential attachment =
    deg(u)·deg(v), exact int64); by default pairs that are
    ALREADY edges are anti-joined away (set ``include_edges=True`` to
    score them too).

    Dataflow: full (unoriented) adjacency rows bucketed by center — a
    center's degree is its group run-length, so cn and aa =
    Σ 1/ln(deg(center)) need NO degree join; one bucketed sum per pair;
    Jaccard = cn/(deg_u+deg_v−cn) attaches the two endpoint degrees via
    the same broadcast-or-join split as the triangle orientation.

    A degree-d hub center emits d(d−1)/2 candidate pairs — quadratic and
    inherent to the definition. ``max_center_degree`` skips super-hub
    centers (their 1/ln(deg) contribution is near-noise for ranking);
    leave it None for exact semantics (the oracle queries do)."""
    B = num_buckets or max(16, graph.num_partitions)
    und = _canonical_undirected(graph).materialize()
    deg = _degree_table(graph, und)
    pairs = _pair_common_neighbors(und, B, max_center_degree)

    I64, F64 = pa.int64(), pa.float64()
    psch = [("u", I64), ("v", I64), ("cn", I64), ("adamic_adar", F64)]
    if not include_edges:
        marker = und.map_batches(
            lambda b: b.append_column(
                "is_edge", pa.array(np.ones(b.num_rows, dtype=np.int8))
            ),
            batch_format="pyarrow",
        )
        pairs = bucket_hash_join(
            pairs, marker, ["u", "v"], right_on=["lo", "hi"], how="left",
            num_buckets=B,
            left_schema=pa.schema(psch),
            right_schema=pa.schema([("lo", I64), ("hi", I64), ("is_edge", pa.int8())]),
        )

        def drop_edges(df: pd.DataFrame):
            out = df[df["is_edge"].isna()].drop(columns=["lo", "hi", "is_edge"])
            if not len(out):
                return pa.table(
                    {c: pa.array([], type=t) for c, t in psch}
                )
            for col in ("u", "v", "cn"):
                out[col] = out[col].astype(np.int64)
            return out

        pairs = pairs.map_batches(drop_edges, batch_format="pandas")

    if graph.meta.num_vertices <= BROADCAST_VERTEX_LIMIT:
        import ray as _ray

        dpd = deg.to_pandas()
        order = np.argsort(dpd["vertex_id"].to_numpy())
        ids_ref = _ray.put(dpd["vertex_id"].to_numpy()[order])
        deg_ref = _ray.put(dpd["deg"].to_numpy()[order])

        def jac_bcast(b: pa.Table) -> pa.Table:
            ids = _ray.get(ids_ref)
            dg = _ray.get(deg_ref)
            u = b["u"].to_numpy(zero_copy_only=False)
            v = b["v"].to_numpy(zero_copy_only=False)
            cn = b["cn"].to_numpy(zero_copy_only=False)
            du = dg[np.searchsorted(ids, u)]
            dv = dg[np.searchsorted(ids, v)]
            return b.append_column(
                "jaccard", pa.array(cn / (du + dv - cn).astype(np.float64))
            ).append_column(
                "pref_attach", pa.array((du * dv).astype(np.int64))
            ).select(["u", "v", "cn", "jaccard", "adamic_adar",
                      "pref_attach"])

        return pairs.map_batches(
            jac_bcast, batch_format="pyarrow", zero_copy_batch=True
        )

    dsch = pa.schema([("vertex_id", I64), ("deg", I64)])
    j = bucket_hash_join(
        pairs, deg, ["u"], right_on=["vertex_id"], num_buckets=B,
        left_schema=pa.schema(psch), right_schema=dsch,
    )
    j = j.map_batches(
        lambda b: b.rename_columns(
            ["deg_u" if c == "deg" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
    j = bucket_hash_join(
        j, deg, ["v"], right_on=["vertex_id"], num_buckets=B,
        left_schema=pa.schema(psch + [("deg_u", I64)]), right_schema=dsch,
    )

    def jac(b: pa.Table) -> pa.Table:
        cn = b["cn"].to_numpy(zero_copy_only=False)
        du = b["deg_u"].to_numpy(zero_copy_only=False)
        dv = b["deg"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "jaccard", pa.array(cn / (du + dv - cn).astype(np.float64))
        ).append_column(
            "pref_attach", pa.array((du * dv).astype(np.int64))
        ).select(["u", "v", "cn", "jaccard", "adamic_adar", "pref_attach"])

    return j.map_batches(jac, batch_format="pyarrow")


def transitivity(graph: Graph, *, num_buckets: int | None = None) -> float:
    """Global transitivity (graph clustering coefficient):
    ``3·triangles / wedges`` with wedges = Σ_v deg(v)·(deg(v)−1)/2.
    0.0 for wedge-free graphs."""
    B = num_buckets or max(16, graph.num_partitions)
    und = _canonical_undirected(graph).materialize()
    deg = _degree_table(graph, und)

    def wedge_counts(b: pa.Table) -> pa.Table:
        d = b["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"wedges": pa.array([int(np.sum(d * (d - 1) // 2))])})

    wedges = (
        deg.map_batches(wedge_counts, batch_format="pyarrow", zero_copy_batch=True)
        .sum("wedges")
    )
    if not wedges:
        return 0.0
    tri3 = 3 * _closed_wedges(graph, B).count()
    return tri3 / wedges


def _local_two_hop(und: pd.DataFrame) -> pd.DataFrame:
    """In-process mirror of the two_hop_sizes dataflow (identical rule):
    wedge pairs + direct edges, lexsort dedup, endpoint count fold."""
    from flashray.joins import pairs_within_groups

    lo = und["lo"].to_numpy(dtype=np.int64)
    hi = und["hi"].to_numpy(dtype=np.int64)
    center = np.concatenate([lo, hi])
    leaf = np.concatenate([hi, lo])
    order = np.lexsort((leaf, center))
    a, b, _ = pairs_within_groups(center[order], leaf[order])
    A = np.concatenate([a, lo])
    B_ = np.concatenate([b, hi])
    o2 = np.lexsort((B_, A))
    A, B_ = A[o2], B_[o2]
    keep = np.r_[True, (A[1:] != A[:-1]) | (B_[1:] != B_[:-1])]
    A, B_ = A[keep], B_[keep]
    vid, n2 = np.unique(np.concatenate([A, B_]), return_counts=True)
    dvid, deg = np.unique(np.concatenate([lo, hi]), return_counts=True)
    # every edge is also a distinct pair, so vid == dvid elementwise
    return pd.DataFrame(
        {
            "vertex_id": vid.astype(np.int64),
            "n2": n2.astype(np.int64),
            "n1": deg.astype(np.int64),
        }
    )


def two_hop_sizes(
    graph: Graph,
    *,
    num_buckets: int | None = None,
    local_threshold: int | None = LOCAL_EDGE_THRESHOLD,
) -> ray.data.Dataset:
    """Distinct 2-hop neighborhood size per vertex: ``n1`` = |N(v)| and
    ``n2`` = |{u ≠ v : dist(v,u) ≤ 2}| on the undirected (canonical,
    cross-etype-deduped) edge set. The local ball-size statistic behind
    friend-of-friend features and HyperBall's r=2 truth.

    Dataflow (wedge-shaped, same cost envelope as clustering_coefficient):
    adjacency grouped by CENTER vertex emits every in-group pair — all
    (a, b) with a common neighbor — vectorized via pairs_within_groups;
    direct edges union in; ONE bucket dedup on (lo, hi) makes pairs
    distinct; per-vertex counts fold both endpoints. Pair volume is
    Σ_m deg(m)², so super-hub centers dominate — the same split/salt
    limits as the wedge family apply (SURVEY §2.2 A7). Below
    ``local_threshold`` edges the identical wedge pass runs in-process
    (the wedge-family hybrid rule)."""
    from flashray.joins import bucket_group_agg, pairs_within_groups

    if local_threshold and graph.meta.num_edges <= local_threshold:
        return ray.data.from_pandas(_local_two_hop(_local_und_pdf(graph)))
    B = num_buckets or max(16, graph.num_partitions)
    und = _canonical_undirected(graph).materialize()

    def both_dirs(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        center = np.concatenate([lo, hi])
        leaf = np.concatenate([hi, lo])
        return pa.table(
            {
                "center": center,
                "leaf": leaf,
                "__bucket": (center % B).astype(np.int64),
            }
        )

    adj = und.map_batches(both_dirs, batch_format="pyarrow", zero_copy_batch=True)

    def wedge_pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["center", "leaf"], kind="mergesort")
        a, b2, _ = pairs_within_groups(
            d["center"].to_numpy(), d["leaf"].to_numpy()
        )
        return pd.DataFrame({"lo": a, "hi": b2})

    pairs2 = adj.groupby("__bucket").map_groups(wedge_pairs, batch_format="pandas")
    allpairs = pairs2.union(und)
    distinct = bucket_group_agg(allpairs, ["lo", "hi"], None, num_buckets=B)

    def per_vertex(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vertex_id": np.concatenate([lo, hi]),
                "n2": np.ones(2 * len(lo), dtype=np.int64),
            }
        )

    n2 = bucket_group_agg(
        distinct.map_batches(per_vertex, batch_format="pyarrow", zero_copy_batch=True),
        ["vertex_id"],
        {"n2": ("n2", "sum")},
        num_buckets=B,
    )
    deg = _deg_from_und(und)
    from flashray.joins import bucket_hash_join

    out = bucket_hash_join(
        n2, deg.map_batches(
            lambda b: b.rename_columns(
                ["vertex_id", "n1"]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        on=["vertex_id"],
        num_buckets=B,
    )
    return out


def bipartite_project(
    edges: ray.data.Dataset,
    *,
    left_col: str,
    right_col: str,
    max_center_degree: int | None = None,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """One-mode projection of a bipartite edge table onto its LEFT side:
    for every pair of left vertices sharing ≥ 1 right neighbor, the
    co-occurrence count ``cn`` (= # distinct shared right vertices) plus
    the degree-normalized ``jaccard = cn/(du+dv−cn)`` and ``cosine =
    cn/√(du·dv)`` similarity weights (d = # distinct right neighbors).
    The standard co-occurrence-graph construction (user×item → item
    graph, doc×term → term graph). Returns (u, v, cn, jaccard, cosine)
    with u < v; u/v keep the left column's type (int64 or string).

    Dataflow: one bucket dedup of (left, right), wedges bucketed by the
    RIGHT vertex (the center) with fully vectorized in-bucket pair
    expansion (`pairs_within_groups` on factorized codes — no Python per
    center), one bucketed sum per pair, one degree aggregate + two hash
    joins for the normalized weights. A degree-d center emits d(d−1)/2
    pairs — quadratic and inherent to the definition; cap super-hub
    centers with ``max_center_degree`` (weights become lower bounds,
    the usual practice for web-scale co-occurrence)."""
    import pyarrow.compute as pc  # noqa: F401  (kept for parity with siblings)

    from flashray.joins import (
        _arrow_schema,
        _key_hash,
        bucket_group_agg,
        bucket_hash_join,
    )

    proj = edges.map_batches(
        lambda b: b.select([left_col, right_col]).replace_schema_metadata(None),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    dist = bucket_group_agg(
        proj, [left_col, right_col], None, num_buckets=num_buckets
    ).materialize()
    sch = _arrow_schema(dist)
    ltype = sch.field(left_col).type
    lt = pa.string() if pa.types.is_string(ltype) else pa.int64()
    B = num_buckets

    def tag_center(b: pa.Table) -> pa.Table:
        b = b.replace_schema_metadata(None)
        h = _key_hash(b, [right_col])
        return b.append_column(
            "__cbucket", pa.array((h % np.uint64(B)).astype(np.int64))
        )

    pair_empty = pa.table(
        {
            "u": pa.array([], lt),
            "v": pa.array([], lt),
            "cn1": pa.array([], pa.int64()),
        }
    ).to_pandas()

    def wedge_pairs(g: pd.DataFrame) -> pd.DataFrame:
        cvals = g[right_col].to_numpy()
        lvals = g[left_col].to_numpy()
        cu, ccodes = np.unique(cvals, return_inverse=True)
        lu, lcodes = np.unique(lvals, return_inverse=True)
        order = np.lexsort((lcodes, ccodes))
        ccodes, lcodes = ccodes[order], lcodes[order]
        if max_center_degree is not None:
            _, counts = np.unique(ccodes, return_counts=True)
            keep = np.repeat(counts <= max_center_degree, counts)
            ccodes, lcodes = ccodes[keep], lcodes[keep]
        u, v, _ = pairs_within_groups(ccodes, lcodes)
        if not len(u):
            return pair_empty  # typed empty: untyped object columns
            # poison the downstream block unify / key hash
        out = pd.DataFrame({"u": lu[u], "v": lu[v]})
        out["cn1"] = np.ones(len(out), dtype=np.int64)
        return out

    pairs = bucket_group_agg(
        dist.map_batches(tag_center, batch_format="pyarrow")
        .groupby("__cbucket")
        .map_groups(wedge_pairs, batch_format="pandas"),
        ["u", "v"],
        {"cn": ("cn1", "sum")},
        num_buckets=B,
    )

    deg = bucket_group_agg(
        dist, [left_col], {"deg": (right_col, "size")}, num_buckets=B
    ).map_batches(
        lambda df: df.rename(columns={left_col: "vx"}), batch_format="pandas"
    )
    dsch = pa.schema([("vx", lt), ("deg", pa.int64())])
    psch = pa.schema([("u", lt), ("v", lt), ("cn", pa.int64())])
    j = bucket_hash_join(
        pairs, deg, ["u"], right_on=["vx"],
        num_buckets=B, left_schema=psch, right_schema=dsch,
        suffixes=("", "_u"),
    ).map_batches(
        lambda df: df.rename(columns={"deg": "du"}), batch_format="pandas"
    )
    jsch = pa.schema(
        [("u", lt), ("v", lt), ("cn", pa.int64()), ("du", pa.int64())]
    )
    j = bucket_hash_join(
        j, deg, ["v"], right_on=["vx"],
        num_buckets=B, left_schema=jsch, right_schema=dsch,
    )

    def weights(df: pd.DataFrame) -> pd.DataFrame:
        cn = df["cn"].to_numpy(dtype=np.int64)
        du = df["du"].to_numpy(dtype=np.int64)
        dv = df["deg"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "u": df["u"].to_numpy(),
                "v": df["v"].to_numpy(),
                "cn": cn,
                "jaccard": cn / (du + dv - cn),
                "cosine": cn / np.sqrt(du.astype(np.float64) * dv),
            }
        )

    return j.map_batches(weights, batch_format="pandas")


def triangle_count_sampled(
    graph: Graph,
    *,
    p: float = 0.1,
    salt: str = "tri",
    hash_mode: str = "sha",
    num_buckets: int | None = None,
) -> dict:
    """DOULION approximate triangle count (Tsourakakis et al., KDD 2009):
    keep each canonical undirected edge independently with probability
    ``p`` — here a DETERMINISTIC hash coin, ``sha64(salt|lo|hi) <
    ⌊p·2⁶⁴⌋`` (exact integer compare, the `hash_split` convention: no
    float boundary, bit-reproducible across runs/partitionings, and a
    SQL replay samples the identical edge set) — count triangles on the
    sample with the SAME degree-oriented wedge dataflow, and scale by
    1/p³ (each surviving triangle needs its 3 edges kept). The
    approximate scale path for the wedge family: expected wedge work
    drops ~p², variance per the paper. Returns ``{"estimate",
    "sampled_triangles", "p", "threshold"}``; ``threshold`` is the
    integer the SQL replay must reuse verbatim.

    ``hash_mode``: 'sha' (default) is the repo-wide SQL-parity coin but
    runs one hashlib call per edge — at 100-TB edge counts use
    'splitmix' (the `walks.py` dual-mode convention): the coin becomes
    the vectorized ``splitmix64(splitmix64(crc32(salt)^lo)^hi)``, same
    statistics, same determinism, no per-row Python."""
    from flashray.datapipe.sketches import _sha_u64
    from flashray.ids import _splitmix64

    B = num_buckets or max(16, graph.num_partitions)
    if not 0.0 < p <= 1.0:
        raise ValueError("need 0 < p <= 1")
    if hash_mode not in ("sha", "splitmix"):
        raise ValueError("hash_mode must be 'sha' or 'splitmix'")
    thr = np.uint64(int(p * float(1 << 64))) if p < 1.0 else np.uint64(
        (1 << 64) - 1
    )
    import zlib

    salt_u64 = np.uint64(zlib.crc32(salt.encode()))

    def samp(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        if hash_mode == "sha":
            h = _sha_u64([f"{salt}|{a}|{c}" for a, c in zip(lo, hi)])
        else:
            with np.errstate(over="ignore"):
                h = _splitmix64(
                    _splitmix64(salt_u64 ^ lo.astype(np.uint64))
                    ^ hi.astype(np.uint64)
                )
        m = h < thr if p < 1.0 else np.ones(len(h), dtype=bool)
        return pa.table({"lo": lo[m], "hi": hi[m]})

    und = _canonical_undirected(graph)
    s = und.map_batches(
        samp, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    deg = _deg_from_und(s)
    oriented = _orient_und(s, deg, graph.meta.num_vertices, B).materialize()
    cnt = int(_closed_from_oriented(oriented, B).count())
    return {
        "estimate": cnt / (p ** 3),
        "sampled_triangles": cnt,
        "p": float(p),
        "threshold": int(thr),
    }


# ---------------------------------------------------------------------------
# 4-clique counting (k-clique k=4 on the triangle machinery)
# ---------------------------------------------------------------------------
#
# A 4-clique {p,q,r,s} in (deg,id) orientation p<q<r<s contains exactly two
# triangles whose CLOSING edge is (r,s): (p;r,s) and (q;r,s) — their centers
# p,q are adjacent. No other closing edge of the clique carries two of its
# centers, so: 4-cliques == adjacent center pairs among triangles grouped by
# closing edge, each clique found EXACTLY once. This reuses the wedge
# dataflow wholesale: one extra groupby on the closing edge + one extra
# bucketed semi-join against the oriented edge set — no new shuffle shapes.


def _center_pair_codes(
    w1: np.ndarray, w2: np.ndarray, c: np.ndarray
) -> pd.DataFrame:
    """Pairs of triangle centers sharing a closing edge (vectorized).

    Input rows are closed wedges (w1, w2, center); output rows are
    candidate 4-cliques (lo, hi, e1, e2) where (lo, hi) = the center pair
    (id-canonical, pending the adjacency probe) and (e1, e2) = the shared
    closing edge. Centers are distinct per closing edge (triangles are
    unique), so pairs_within_groups emits each unordered pair once."""
    if len(w1) == 0:
        z = np.zeros(0, dtype=np.int64)
        return pd.DataFrame({"lo": z, "hi": z, "e1": z, "e2": z})
    order = np.lexsort((c, w2, w1))
    w1s, w2s, cs = w1[order], w2[order], c[order]
    change = np.empty(len(w1s), dtype=bool)
    change[0] = True
    change[1:] = (w1s[1:] != w1s[:-1]) | (w2s[1:] != w2s[:-1])
    code = np.cumsum(change) - 1
    c1, c2, codep = pairs_within_groups(code, cs)
    starts = np.flatnonzero(change)
    return pd.DataFrame(
        {
            "lo": c1,  # ascending within group -> already id-canonical
            "hi": c2,
            "e1": w1s[starts][codep],
            "e2": w2s[starts][codep],
        }
    )


def _local_four_clique_counts(und: pd.DataFrame) -> pd.DataFrame:
    """In-process mirror of the distributed 4-clique dataflow (same
    orientation, same center-pair rule, same adjacency probe)."""
    lo = und["lo"].to_numpy(dtype=np.int64)
    hi = und["hi"].to_numpy(dtype=np.int64)
    w1, w2, c = _local_closed_wedges(lo, hi)
    cand = _center_pair_codes(w1, w2, c)
    if not len(cand):
        return pd.DataFrame(
            {
                "vertex_id": np.zeros(0, dtype=np.int64),
                "cliques4": np.zeros(0, dtype=np.int64),
            }
        )
    ids = np.unique(np.concatenate([lo, hi]))
    nv = len(ids)
    ekey = np.sort(
        np.searchsorted(ids, np.minimum(lo, hi)) * nv
        + np.searchsorted(ids, np.maximum(lo, hi))
    )
    pkey = (
        np.searchsorted(ids, cand["lo"].to_numpy()) * nv
        + np.searchsorted(ids, cand["hi"].to_numpy())
    )
    pos = np.searchsorted(ekey, pkey)
    adj = (pos < len(ekey)) & (ekey[np.minimum(pos, len(ekey) - 1)] == pkey)
    kept = cand[adj]
    members = np.concatenate(
        [
            kept["lo"].to_numpy(),
            kept["hi"].to_numpy(),
            kept["e1"].to_numpy(),
            kept["e2"].to_numpy(),
        ]
    )
    vid, cnt = np.unique(members, return_counts=True)
    return pd.DataFrame(
        {"vertex_id": vid.astype(np.int64), "cliques4": cnt.astype(np.int64)}
    )


def four_cliques(
    graph: Graph,
    *,
    num_buckets: int | None = None,
    local_threshold: int | None = LOCAL_EDGE_THRESHOLD,
) -> ray.data.Dataset:
    """Per-vertex 4-clique participation counts: Dataset
    (vertex_id, cliques4); vertices in no 4-clique are absent.

    Distributed path (reference parity: SURVEY.md §2.2 A5's
    neighborhood-intersection family, extended one clique order up):
    oriented edges -> closed wedges (the triangle dataflow, reused) ->
    groupby closing edge -> vectorized center-pair expansion -> one
    bucketed hash-join against the oriented edge set. Each 4-clique
    survives exactly once (see module note above), so per-vertex counts
    are a flat member expansion + bucketed sum. Cost beyond triangles:
    one groupby shuffle of the triangle list + one bucket join — both
    O(#triangles), the standard k-clique-counting lower envelope."""
    if local_threshold and graph.meta.num_edges <= local_threshold:
        pdf = _local_four_clique_counts(_local_und_pdf(graph))
        # explicit schema: from_pandas on an EMPTY frame drops columns
        return ray.data.from_arrow(
            pa.table(
                {
                    "vertex_id": pa.array(
                        pdf["vertex_id"].to_numpy(), type=pa.int64()
                    ),
                    "cliques4": pa.array(
                        pdf["cliques4"].to_numpy(), type=pa.int64()
                    ),
                }
            )
        )
    B = num_buckets or max(16, graph.num_partitions)
    oriented = _oriented_edges(graph, B).materialize()
    if graph.meta.num_edges <= BROADCAST_CSR_EDGE_LIMIT:
        closed = _closed_from_oriented_broadcast(oriented)
    else:
        closed = _closed_from_oriented(oriented, B)

    def bucket_by_edge(b: pa.Table) -> pa.Table:
        w1 = b["w1"].to_numpy(zero_copy_only=False)
        w2 = b["w2"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            hb = (
                w1.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                ^ w2.astype(np.uint64)
            ) % np.uint64(B)
        return b.append_column("ebucket", pa.array(hb.astype(np.int64)))

    def center_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return _center_pair_codes(
            g["w1"].to_numpy(dtype=np.int64),
            g["w2"].to_numpy(dtype=np.int64),
            g["center"].to_numpy(dtype=np.int64),
        )

    cand = (
        closed.map_batches(
            bucket_by_edge, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("ebucket")
        .map_groups(center_pairs, batch_format="pandas")
    )

    def okey(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        return pa.table({"lo": np.minimum(a, bb), "hi": np.maximum(a, bb)})

    probe = oriented.map_batches(okey, batch_format="pyarrow")
    I64 = pa.int64()
    cliq = bucket_hash_join(
        cand, probe, ["lo", "hi"], num_buckets=B,
        left_schema=pa.schema(
            [("lo", I64), ("hi", I64), ("e1", I64), ("e2", I64)]
        ),
        right_schema=pa.schema([("lo", I64), ("hi", I64)]),
    )

    def to_members(b: pa.Table) -> pa.Table:
        cols = [
            b[c].to_numpy(zero_copy_only=False) for c in ("lo", "hi", "e1", "e2")
        ]
        m = np.concatenate(cols)
        return pa.table(
            {
                "vertex_id": m,
                "cliques4": np.ones(len(m), dtype=np.int64),
            }
        )

    from flashray.joins import bucket_group_agg

    return bucket_group_agg(
        cliq.map_batches(
            to_members, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["vertex_id"],
        {"cliques4": ("cliques4", "sum")},
    )


def four_clique_count(graph: Graph, **kw) -> int:
    """Total number of 4-cliques (each clique has exactly 4 members)."""
    df = four_cliques(graph, **kw).to_pandas()
    return int(df["cliques4"].sum()) // 4 if len(df) else 0


def incremental_triangle_count(
    graph_new: Graph,
    delta_edges: ray.data.Dataset,
    *,
    num_buckets: int | None = None,
) -> int:
    """Triangles CREATED by an edge ingest — the incremental-analytics
    companion to the PageRank/WCC warm starts: after ``add_edges``
    merged ``delta_edges`` into ``graph_new``, the new-triangle count is
    the inclusion–exclusion  ``A − B + C``  over how many delta edges
    each new triangle uses (k ∈ {1,2,3}):

    - ``A`` = Σ over delta edges of their triangle support in the FULL
      graph (counts a k-delta triangle k times) — one
      :func:`edge_support` pass + a semi-join on the delta set;
    - ``B`` = wedge pairs of two delta edges sharing a vertex whose
      outer pair is a FULL-graph edge (counts C(k,2) times) — one
      delta-wedge expansion + a semi-join against the canonical edge
      set;
    - ``C`` = triangles entirely inside the delta (k=3) — the SAME
      wedge expansion semi-joined against the delta itself, /3.

    Then A − B + C = Σ N_k·(k − C(k,2)) + N₃ = N₁+N₂+N₃. Cost scales
    with the DELTA's wedges plus one support pass — not with the old
    graph's triangle count. ``delta_edges`` (src, dst rows, any
    direction) must be disjoint from the pre-ingest edge set; rows are
    canonicalized and deduped here."""
    from flashray.joins import bucket_group_agg, bucket_semi_join

    I64 = pa.int64()
    B = num_buckets or 64

    def canon_batch(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        keep = lo < hi
        return pa.table(
            {"lo": pa.array(lo[keep]), "hi": pa.array(hi[keep])}
        )

    canon = bucket_group_agg(
        delta_edges.map_batches(canon_batch, batch_format="pyarrow"),
        ["lo", "hi"],
        None,
        num_buckets=B,
    ).materialize()

    # A: full-graph support of every delta edge
    sup = edge_support(graph_new, num_buckets=B, include_zero=False)
    a_rows = bucket_semi_join(
        sup, canon, ["lo", "hi"], num_buckets=B,
        left_schema=pa.schema(
            [("lo", I64), ("hi", I64), ("support", I64)]
        ),
    )
    a_parts = a_rows.map_batches(
        lambda df: pd.DataFrame(
            {"s": [int(df["support"].sum())]}
        ),
        batch_format="pandas",
    ).to_pandas()
    A = int(a_parts["s"].sum()) if len(a_parts) else 0

    # delta wedges: center c with two delta neighbors n1 < n2
    def sym_batch(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "c": pa.array(np.concatenate([lo, hi])),
                "n": pa.array(np.concatenate([hi, lo])),
            }
        )

    def add_cbucket(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "__cb", pa.array((c % B).astype(np.int64))
        )

    def wedge_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["c", "n"])
        codes = pd.factorize(g["c"], sort=False)[0]
        n1, n2, _ = pairs_within_groups(
            codes.astype(np.int64), g["n"].to_numpy(dtype=np.int64)
        )
        return pd.DataFrame(
            {"lo": pd.Series(n1, dtype=np.int64),
             "hi": pd.Series(n2, dtype=np.int64)}
        )

    pairs = (
        canon.map_batches(sym_batch, batch_format="pyarrow")
        .map_batches(add_cbucket, batch_format="pyarrow")
        .groupby("__cb")
        .map_groups(wedge_pairs, batch_format="pandas")
    ).materialize()

    full_canon = bucket_group_agg(
        graph_new.edges_dataset(columns=["src", "dst"]).map_batches(
            canon_batch, batch_format="pyarrow"
        ),
        ["lo", "hi"],
        None,
        num_buckets=B,
    )
    psch = pa.schema([("lo", I64), ("hi", I64)])
    B_count = bucket_semi_join(
        pairs, full_canon, ["lo", "hi"], num_buckets=B, left_schema=psch
    ).count()
    # NOTE: semi join dedups left rows? It must NOT here — two distinct
    # wedge centers produce the same (n1, n2) pair and both must count.
    C3 = bucket_semi_join(
        pairs, canon, ["lo", "hi"], num_buckets=B, left_schema=psch
    ).count()
    assert C3 % 3 == 0, C3
    return A - int(B_count) + C3 // 3
