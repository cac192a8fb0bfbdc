"""Superstep engine: stateful shard actors + gather-scatter rounds.

Rebuild of ``flash-graph/graph_engine.h/.cpp`` — ``graph_engine`` +
``worker_thread`` (SURVEY.md §2.1 E1–E13, §3.1 steps 5–7). Mapping:

- reference worker threads pinned to NUMA-partitioned vertex ranges →
  one ``ShardActor`` per edge partition (P fixed at graph build; the
  partition→actor mapping is explicit and stable across supersteps and
  restarts — SURVEY.md §7.3's core invariant);
- per-thread message queues + superstep barrier → an explicit all-to-all
  exchange of *pre-combined* partial aggregates (map-side combine via
  reduceat == the reference's multicast/E7 I/O dedup; a hot destination
  receives ≤ P partials regardless of in-degree);
- SAFS page cache → the Ray object store: partial arrays move between
  actors as object refs, zero-copy for numpy;
- ``wait4complete`` (E2) → the driver awaiting all ``apply`` futures and
  summing their metric dicts.

Why raw actors and not ``Dataset.map_batches`` here: the inner loop mutates
per-partition vertex state across iterations and must route each partition's
aggregate back to the *owning* actor. ``map_batches`` actor pools do not
guarantee batch→actor affinity, which would silently break state ownership;
everything around the loop (extraction, graph build, triangles, results,
datapipe) stays in the Dataset API. See SURVEY.md §7.3.

The message exchange is deterministic: reduceat is order-stable and the
reduce side combines partials in fixed sender order, so results are
bit-identical across parallelism levels and across checkpoint/resume.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from flashray import csr
from flashray.build import Graph
from flashray.programs import VertexProgram


def _read_part(base: str, part: int, columns: list[str]) -> pa.Table:
    path = os.path.join(base, f"part={part}")
    if not os.path.isdir(path):
        return pa.table({c: pa.array([], type=pa.int64()) for c in columns})
    return pq.read_table(path, columns=columns)


@ray.remote
class ShardActor:
    """Owns one partition: CSR block + per-vertex program state.

    Reference analogue: one ``worker_thread`` + its slice of the
    ``NUMA_graph_index`` vertex-state array (flash-graph/graph_index.h)."""

    def __init__(
        self,
        graph_path: str,
        part: int,
        P: int,
        program: VertexProgram,
        N: int,
        split_ids: np.ndarray,
    ):
        self.part = part
        self.P = P
        self.program = program
        self.N = N
        self.split_ids = np.asarray(split_ids, dtype=np.int64)

        vt = _read_part(
            os.path.join(graph_path, "vertices"),
            part,
            ["vertex_id", "out_degree", "in_degree"],
        )
        et = _read_part(
            os.path.join(graph_path, "edges"), part, ["src", "dst", "weight"]
        )
        self.shard = csr.build_shard(
            part,
            P,
            vt["vertex_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            vt["out_degree"].to_numpy(zero_copy_only=False).astype(np.int64),
            vt["in_degree"].to_numpy(zero_copy_only=False).astype(np.int64),
            et["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            et["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
            et["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
            if et.num_rows
            else None,
        )
        # mirror srcs -> position in the global (sorted) split-id list
        self.mirror_map = np.searchsorted(self.split_ids, self.shard.mirror_ids)
        if len(self.shard.mirror_ids) and not (
            (self.mirror_map < len(self.split_ids))
            & (self.split_ids[np.minimum(self.mirror_map, max(len(self.split_ids) - 1, 0))]
               == self.shard.mirror_ids)
        ).all():
            raise AssertionError(f"shard {part}: mirror src not in split list")
        # owned split vertices -> (global split position, local vertex index)
        owned_splits = self.split_ids[self.split_ids % P == part]
        self.split_global_pos = np.searchsorted(self.split_ids, owned_splits)
        self.split_local_idx = np.searchsorted(self.shard.vertex_ids, owned_splits)

        self.state = program.init_state(self.shard, N)
        self.incoming_idx: list[np.ndarray] | None = None
        self.last_messages = 0

    def ready(self) -> bool:
        return True

    def outgoing_ids(self):
        return self.shard.outgoing_dst_ids()

    def set_incoming(self, *dst_id_arrays):
        idxs = []
        for arr in dst_id_arrays:
            arr = np.asarray(arr, dtype=np.int64)
            idx = np.searchsorted(self.shard.vertex_ids, arr)
            if len(arr) and not (
                self.shard.vertex_ids[
                    np.minimum(idx, max(self.shard.nv - 1, 0))
                ]
                == arr
            ).all():
                raise AssertionError(f"shard {self.part}: unknown incoming dst")
            idxs.append(idx)
        self.incoming_idx = idxs
        return True

    def _masked_signal(self) -> np.ndarray:
        sig = self.program.signal(self.shard, self.state)
        if self.program.frontier_only:
            sig = np.where(self.state["active"], sig, self.program.identity)
        return sig

    def split_signal(self):
        """Signals of split vertices owned here (already frontier-masked)."""
        sig = self._masked_signal()
        return self.split_global_pos, sig[self.split_local_idx]

    def scatter(self, mirror_signals=None):
        """E3/E4/E6: per-edge messages → per-(dst partition, dst) partials."""
        sh = self.shard
        prog = self.program
        sig = self._masked_signal()
        signal_by_code = np.full(
            len(sh.src_list), prog.identity, dtype=sig.dtype if sig.size else np.float64
        )
        signal_by_code[sh.owned_codes] = sig[sh.owned_idx]
        if len(sh.mirror_codes):
            signal_by_code[sh.mirror_codes] = np.asarray(mirror_signals)[
                self.mirror_map
            ]
        # edges processed this superstep (for the lineage metrics / headline
        # throughput): count edges whose source actually emitted
        counts = np.diff(sh.src_code_starts)
        self.last_messages = int(counts[signal_by_code != prog.identity].sum())
        return csr.scatter_partials(
            sh,
            signal_by_code,
            combine=prog.combine,
            identity=prog.identity,
            use_weights=prog.use_weights,
        )

    def apply(self, *partials):
        """E5/E8: combine incoming partials, run the vertex update."""
        sh = self.shard
        prog = self.program
        agg = np.full(sh.nv, prog.identity, dtype=prog.dtype)
        for idx, partial in zip(self.incoming_idx, partials):
            if len(partial) == 0:
                continue
            if prog.combine == "sum":
                agg[idx] += partial
            else:
                agg[idx] = np.minimum(agg[idx], partial)
        metrics = prog.apply(sh, self.state, agg, self.N)
        metrics["messages"] = self.last_messages
        return metrics

    def on_event(self, payload: dict):
        return self.program.on_event(self.shard, self.state, payload)

    def values_table(self) -> pa.Table:
        return pa.table(
            {
                "vertex_id": pa.array(self.shard.vertex_ids),
                "value": pa.array(self.state["values"]),
            }
        )

    def write_values(self, out_dir: str) -> str:
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"part-{self.part:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(self.values_table(), tmp)
        os.replace(tmp, path)
        return path

    def checkpoint(self, ckpt_dir: str, iteration: int) -> str:
        """Per-partition state snapshot (SURVEY.md §3.3: the reference has
        none — rerun-on-failure; this is a rebuild addition per the north
        rule)."""
        d = os.path.join(ckpt_dir, f"iter_{iteration:06d}")
        os.makedirs(d, exist_ok=True)
        cols = {"vertex_id": pa.array(self.shard.vertex_ids)}
        for name in self.program.state_columns():
            arr = self.state[name]
            if arr.dtype == bool:
                arr = arr.astype(np.uint8)
            cols[name] = pa.array(arr)
        path = os.path.join(d, f"part-{self.part:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(pa.table(cols), tmp)
        os.replace(tmp, path)
        return path

    def restore(self, ckpt_dir: str, iteration: int) -> bool:
        d = os.path.join(ckpt_dir, f"iter_{iteration:06d}")
        t = pq.read_table(os.path.join(d, f"part-{self.part:05d}.parquet"))
        vids = t["vertex_id"].to_numpy(zero_copy_only=False)
        if not np.array_equal(vids, self.shard.vertex_ids):
            raise AssertionError(f"shard {self.part}: checkpoint vertex mismatch")
        for name in self.program.state_columns():
            arr = t[name].to_numpy(zero_copy_only=False)
            if self.state[name].dtype == bool:
                arr = arr.astype(bool)
            else:
                arr = arr.astype(self.state[name].dtype)
            self.state[name] = arr
        return True

    def set_state_scalar(self, key: str, value):
        self.state[key] = value
        return True


class Engine:
    """Driver-side superstep loop (E1/E2). Algorithms own the iteration
    policy; the engine owns actors, the exchange, metrics, checkpoints."""

    def __init__(
        self,
        graph: Graph,
        program: VertexProgram,
        *,
        actor_cpus: float | None = None,
    ):
        self.graph = graph
        self.program = program
        P = graph.num_partitions
        self.P = P
        self.split_ids = np.asarray(
            sorted(graph.meta.split_vertices), dtype=np.int64
        )
        if actor_cpus is None:
            total = ray.cluster_resources().get("CPU", P)
            actor_cpus = max(0.05, min(1.0, total / max(P, 1) * 0.8))
        self.actors = [
            ShardActor.options(num_cpus=actor_cpus).remote(
                graph.path, p, P, program, graph.meta.num_vertices, self.split_ids
            )
            for p in range(P)
        ]
        ray.get([a.ready.remote() for a in self.actors])
        out_refs = [
            a.outgoing_ids.options(num_returns=P).remote() for a in self.actors
        ]
        ray.get(
            [
                self.actors[q].set_incoming.remote(
                    *[out_refs[p][q] for p in range(P)]
                )
                for q in range(P)
            ]
        )
        self.iteration = 0
        self.lineage: list[dict] = []

    def step(self) -> dict:
        t0 = time.perf_counter()
        mirror_ref = None
        if len(self.split_ids):
            sig_parts = ray.get(
                [a.split_signal.remote() for a in self.actors]
            )
            full = np.full(
                len(self.split_ids),
                self.program.identity,
                dtype=self.program.dtype,
            )
            for pos, vals in sig_parts:
                full[pos] = vals
            mirror_ref = ray.put(full)
        scatter_refs = [
            a.scatter.options(num_returns=self.P).remote(mirror_ref)
            for a in self.actors
        ]
        apply_refs = [
            self.actors[q].apply.remote(
                *[scatter_refs[p][q] for p in range(self.P)]
            )
            for q in range(self.P)
        ]
        per_shard = ray.get(apply_refs)
        agg: dict = {}
        for m in per_shard:
            for k, v in m.items():
                agg[k] = agg.get(k, 0) + v
        agg["iteration"] = self.iteration
        agg["wall_sec"] = time.perf_counter() - t0
        self.lineage.append(agg)
        self.iteration += 1
        return agg

    def broadcast_event(self, payload: dict) -> dict:
        results = ray.get([a.on_event.remote(payload) for a in self.actors])
        agg: dict = {}
        for m in results:
            for k, v in m.items():
                agg[k] = agg.get(k, 0) + v
        return agg

    def checkpoint(self, ckpt_dir: str) -> None:
        from flashray.checkpoint import write_lineage

        ray.get(
            [a.checkpoint.remote(ckpt_dir, self.iteration) for a in self.actors]
        )
        write_lineage(ckpt_dir, self.iteration, self.lineage)

    def restore(self, ckpt_dir: str) -> int:
        from flashray.checkpoint import read_lineage

        iteration, lineage = read_lineage(ckpt_dir)
        ray.get([a.restore.remote(ckpt_dir, iteration) for a in self.actors])
        self.iteration = iteration
        self.lineage = lineage
        return iteration

    def values_pandas(self):
        import pandas as pd

        tables = ray.get([a.values_table.remote() for a in self.actors])
        return pa.concat_tables(tables).to_pandas()

    def write_values(self, out_dir: str):
        ray.get([a.write_values.remote(out_dir) for a in self.actors])
        return out_dir

    def values_dataset(self, out_dir: str):
        self.write_values(out_dir)
        return ray.data.read_parquet(out_dir)

    def close(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
