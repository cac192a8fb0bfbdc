"""flashray — a Ray-Data-native link-graph analytics engine.

A from-scratch rebuild of the query/data-processing capabilities of the
FlashGraph semi-external-memory graph engine (Zheng et al., USENIX FAST 2015),
re-expressed on Ray Data:

- edges are derived from Parquet tables of multi-turn conversation/agent
  transcripts (``flashray.extract``), hash-partitioned by source vertex into
  per-partition CSR blocks (``flashray.build``, ``flashray.csr``),
- iterative vertex programs (PageRank, WCC / hash-min label propagation,
  BFS, k-core) run as gather-scatter supersteps over a pool of stateful
  shard actors that own the CSR blocks (``flashray.engine``,
  ``flashray.programs``),
- triangle counting is a pure Ray Data wedge-join dataflow
  (``flashray.triangles``),
- training-data pipeline operators (dedup, similarity search, text
  analysis) live in ``flashray.datapipe``.

The reference mount ``/root/reference`` was empty during the survey
(SURVEY.md §0); semantics follow the published FlashGraph paper and the
public FlashX API surface (``flash-graph/FGlib.h``) as documented per
operator in SURVEY.md §2.
"""

from flashray.schema import TRANSCRIPT_SCHEMA, EDGE_SCHEMA
from flashray.ids import id64, turn_vertex_ids

__all__ = [
    "TRANSCRIPT_SCHEMA",
    "EDGE_SCHEMA",
    "id64",
    "turn_vertex_ids",
]

__version__ = "0.1.0"
