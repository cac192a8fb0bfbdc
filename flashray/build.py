"""Graph construction: edge Dataset → partitioned on-disk graph layout.

Rebuild of the reference's graph-image construction
(``flash-graph/utils.cpp`` — ``construct_graph``; ``utils/el2fg.cpp``,
SURVEY.md §2.3 S1) as a Ray Data pipeline:

    edges → [symmetrize] → exact dedup → hash-partition by src →
    partitioned parquet + vertex/degree table + meta.json

Layout under ``<path>/``:

- ``edges/part=<p>/*.parquet``  — edge rows, partition ``p`` (see below)
- ``vertices/part=<q>/*.parquet`` — (vertex_id, out_degree, in_degree),
  ``q = vertex_id % P``
- ``meta.json`` — partition count, counts, split-vertex list, options

Partitioning rule: ``part = src % P`` (src is already a uniform 63-bit
hash). **Skew handling (reference E12, vertically-partitioned vertices,
FAST15 §3.6):** a vertex whose out-degree exceeds ``skew_threshold`` has its
out-edges *split across all partitions* (``part = (src + dst) % P``), so no
single shard owns a super-hub's entire adjacency. Its value still lives with
its home partition (``src % P``); the engine broadcasts the small set of
split-vertex values to all shards each superstep (SURVEY.md §4 "skew").

The partition count P is fixed at build time and independent of cluster
size — the partition→actor mapping must be stable across supersteps,
restarts, and the N vs 4N scaling runs (SURVEY.md §7.3).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from flashray.extract import dedup_edges


@dataclass
class GraphMeta:
    path: str
    num_partitions: int
    num_vertices: int
    num_edges: int
    symmetrized: bool
    skew_threshold: int
    split_vertices: list = field(default_factory=list)

    def save(self) -> None:
        with open(os.path.join(self.path, "meta.json"), "w") as f:
            json.dump(
                {
                    "num_partitions": self.num_partitions,
                    "num_vertices": self.num_vertices,
                    "num_edges": self.num_edges,
                    "symmetrized": self.symmetrized,
                    "skew_threshold": self.skew_threshold,
                    "split_vertices": [int(v) for v in self.split_vertices],
                },
                f,
            )

    @staticmethod
    def load(path: str) -> "GraphMeta":
        with open(os.path.join(path, "meta.json")) as f:
            d = json.load(f)
        return GraphMeta(path=path, **d)


class Graph:
    """Handle over the on-disk partitioned graph (the reference's
    ``FG_graph``, flash-graph/FGlib.h — ``FG_graph::create``)."""

    def __init__(self, meta: GraphMeta):
        self.meta = meta

    @property
    def path(self) -> str:
        return self.meta.path

    @property
    def num_partitions(self) -> int:
        return self.meta.num_partitions

    @staticmethod
    def load(path: str) -> "Graph":
        return Graph(GraphMeta.load(path))

    def edges_dataset(self, columns=None) -> ray.data.Dataset:
        return ray.data.read_parquet(
            os.path.join(self.path, "edges"), columns=columns
        )

    def vertices_dataset(self, columns=None) -> ray.data.Dataset:
        return ray.data.read_parquet(
            os.path.join(self.path, "vertices"), columns=columns
        )


def _symmetrize_batch(batch: pa.Table) -> pa.Table:
    """Append the reversed copy of each edge (undirected view, S1 step 2)."""
    rev = pa.Table.from_arrays(
        [
            batch["dst"],
            batch["src"],
            batch["etype"],
            batch["weight"],
            batch["ts"],
        ],
        names=["src", "dst", "etype", "weight", "ts"],
    )
    return pa.concat_tables([batch, rev]).combine_chunks()


def _degree_rows(batch: pa.Table) -> pa.Table:
    """Map-side expansion for the degree table: each edge contributes one
    out-degree row for src and one in-degree row for dst."""
    src = batch["src"].to_numpy(zero_copy_only=False)
    dst = batch["dst"].to_numpy(zero_copy_only=False)
    ones = np.ones(len(src), dtype=np.int64)
    zeros = np.zeros(len(src), dtype=np.int64)
    return pa.Table.from_arrays(
        [
            pa.array(np.concatenate([src, dst])),
            pa.array(np.concatenate([ones, zeros])),
            pa.array(np.concatenate([zeros, ones])),
        ],
        names=["vertex_id", "out_degree", "in_degree"],
    )


def build_graph(
    edges: ray.data.Dataset,
    path: str,
    *,
    num_partitions: int = 16,
    symmetrize: bool = False,
    dedup: bool = True,
    skew_threshold: int | None = None,
) -> Graph:
    """Materialize the partitioned graph layout from an edge Dataset.

    ``edges`` must carry EDGE_SCHEMA columns. ``skew_threshold=None`` means
    "auto": 32 × the average out-degree, at least 512.
    """
    P = num_partitions
    os.makedirs(path, exist_ok=True)

    if symmetrize:
        edges = edges.map_batches(
            _symmetrize_batch, batch_format="pyarrow", zero_copy_batch=True
        )
        dedup = True
    if dedup:
        edges = dedup_edges(edges)

    # One pass for the vertex/degree table (shuffle key: vertex_id int64,
    # with Ray Data's partial+final combine doing the map-side aggregation).
    degrees = (
        edges.map_batches(_degree_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("vertex_id")
        .aggregate(
            Sum("out_degree", alias_name="out_degree"),
            Sum("in_degree", alias_name="in_degree"),
        )
    )

    def add_vpart(batch: pa.Table) -> pa.Table:
        v = batch["vertex_id"].to_numpy(zero_copy_only=False)
        return batch.append_column("part", pa.array((v % P).astype(np.int32)))

    degrees = degrees.map_batches(
        add_vpart, batch_format="pyarrow", zero_copy_batch=True
    )
    degrees.write_parquet(
        os.path.join(path, "vertices"), partition_cols=["part"], mode="overwrite"
    )

    # Degree stats via a distributed aggregate (never the full table on the
    # driver); split-vertex detection via a pushed-down row filter — the
    # result is small by construction (degree > threshold).
    from ray.data.aggregate import Count

    import pyarrow.compute as pc

    stats = (
        ray.data.read_parquet(
            os.path.join(path, "vertices"), columns=["out_degree"]
        )
        .aggregate(Sum("out_degree", alias_name="e"), Count(alias_name="v"))
    )
    num_vertices = int(stats["v"])
    num_edges_total = int(stats["e"])
    if skew_threshold is None:
        avg = max(1, num_edges_total // max(1, num_vertices))
        skew_threshold = max(512, 32 * avg)
    split_df = ray.data.read_parquet(
        os.path.join(path, "vertices"),
        columns=["vertex_id"],
        filter=pc.field("out_degree") > skew_threshold,
    ).to_pandas()
    split_vertices = (
        np.sort(split_df["vertex_id"].to_numpy()).astype(np.int64)
        if len(split_df)
        else np.empty(0, dtype=np.int64)
    )
    split_set_ref = ray.put(split_vertices)

    def add_epart(batch: pa.Table) -> pa.Table:
        splits = ray.get(split_set_ref)
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        part = (src % P).astype(np.int32)
        if len(splits):
            is_split = np.isin(src, splits)
            part = np.where(is_split, ((src + dst) % P).astype(np.int32), part)
        return batch.append_column("part", pa.array(part))

    edges_p = edges.map_batches(
        add_epart, batch_format="pyarrow", zero_copy_batch=True
    )
    edges_p.write_parquet(
        os.path.join(path, "edges"), partition_cols=["part"], mode="overwrite"
    )

    meta = GraphMeta(
        path=path,
        num_partitions=P,
        num_vertices=num_vertices,
        num_edges=num_edges_total,
        symmetrized=symmetrize,
        skew_threshold=int(skew_threshold),
        split_vertices=split_vertices.tolist(),
    )
    meta.save()
    return Graph(meta)


def build_graph_from_arrays(
    src: np.ndarray, dst: np.ndarray, path: str, **kwargs
) -> Graph:
    """Convenience for fixtures/tests: numpy edge arrays → graph layout."""
    from flashray.fixtures import edges_table

    return build_graph(ray.data.from_arrow(edges_table(src, dst)), path, **kwargs)
