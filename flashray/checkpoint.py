"""Checkpoint lineage: per-iteration metrics + resume bookkeeping.

The reference has no checkpointing (single machine, rerun on failure —
SURVEY.md §3.3); this module is the rebuild addition the north rule
requires: per-partition state parquet (written by the shard actors,
engine.ShardActor.checkpoint) plus a ``lineage.json`` recording the last
*complete* iteration and the per-superstep metric history (messages, active
vertices, delta, wall time). The lineage file is written atomically after
all partitions land, so a crash mid-checkpoint leaves the previous complete
iteration authoritative.
"""

from __future__ import annotations

import json
import os


def write_lineage(ckpt_dir: str, iteration: int, lineage: list[dict]) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, "lineage.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"last_complete_iteration": iteration, "lineage": lineage}, f)
    os.replace(tmp, path)


def read_lineage(ckpt_dir: str) -> tuple[int, list[dict]]:
    with open(os.path.join(ckpt_dir, "lineage.json")) as f:
        d = json.load(f)
    return int(d["last_complete_iteration"]), list(d["lineage"])


def has_checkpoint(ckpt_dir: str) -> bool:
    return os.path.exists(os.path.join(ckpt_dir, "lineage.json"))
