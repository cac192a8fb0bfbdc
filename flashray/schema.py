"""Fixed pyarrow schemas for every logical table + validation helpers.

The reference bakes a fixed schema into its graph-image header
(``flash-graph/graph.h`` — ``graph_file_header``; SURVEY.md §1.1): schema is
decided at construction time, never inferred. We keep that philosophy with
Arrow's richer types (SURVEY.md §1.2).
"""

from __future__ import annotations

import pyarrow as pa

# Primary input (BASELINE.json input_hint): multi-turn conversation /
# agent transcripts.
TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),  # null unless role == "tool"
        ("ts", pa.timestamp("us")),
    ]
)

# Derived edge table (the rebuild's "graph image",
# flash-graph/vertex.h — ext_mem_directed_vertex in the reference).
EDGE_SCHEMA = pa.schema(
    [
        ("src", pa.int64()),
        ("dst", pa.int64()),
        ("etype", pa.string()),  # reply | tool | role | ...
        ("weight", pa.float64()),  # count after exact dedup of (src,dst,etype)
        ("ts", pa.timestamp("us")),  # min ts among deduped originals
    ]
)

# Per-vertex result vector (the reference's FG_vector<T>,
# flash-graph/FG_vector.h).
VERTEX_VALUE_SCHEMA = pa.schema(
    [
        ("vertex_id", pa.int64()),
        ("value", pa.float64()),
    ]
)

# Vertex metadata table built at graph-construction time
# (replaces flash-graph/vertex_index.h — vertex_index).
VERTEX_SCHEMA = pa.schema(
    [
        ("vertex_id", pa.int64()),
        ("out_degree", pa.int64()),
        ("in_degree", pa.int64()),
    ]
)

EDGE_TYPES = ("reply", "tool", "role")


def validate_schema(table: pa.Table, expected: pa.Schema, *, name: str = "table") -> None:
    """Raise ValueError if ``table`` doesn't carry exactly ``expected``'s
    columns/types (order-insensitive; extra columns rejected)."""
    got = {f.name: f.type for f in table.schema}
    want = {f.name: f.type for f in expected}
    if set(got) != set(want):
        raise ValueError(
            f"{name}: column mismatch: got {sorted(got)}, want {sorted(want)}"
        )
    for col, typ in want.items():
        if got[col] != typ:
            raise ValueError(f"{name}.{col}: type {got[col]} != expected {typ}")


def cast_to(table: pa.Table, expected: pa.Schema) -> pa.Table:
    """Reorder + cast ``table`` to ``expected`` (strict names)."""
    cols = [table[f.name].cast(f.type) for f in expected]
    return pa.Table.from_arrays(cols, schema=expected)
