"""Property-based equivalence of the two scatter paths (no Ray).

For ANY graph, frontier, semiring (sum/min/max × mul/add weights) and
payload width (scalar or vector), the sparse-frontier scatter must produce
exactly the entries the dense scatter produces for a frontier-masked
signal — the engine switches between them on a size heuristic, so any
divergence would be a silent correctness bug that only appears at
particular frontier densities.

Float caveat: sum-combine adds the same values in a different order on the
two paths, so signals/weights are drawn integer-valued (exact in float64).
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from flashray import csr


@st.composite
def shard_and_frontier(draw):
    n = draw(st.integers(2, 10))
    ne = draw(st.integers(0, 36))
    rng = np.random.default_rng(draw(st.integers(0, 2**31 - 1)))
    src = rng.integers(0, n, ne).astype(np.int64)
    dst = rng.integers(0, n, ne).astype(np.int64)
    weight = rng.integers(1, 8, ne).astype(np.float64)
    shard = csr.build_shard(
        part=0,
        P=1,
        vertex_ids=np.arange(n, dtype=np.int64),
        out_degree=np.bincount(src, minlength=n).astype(np.int64),
        in_degree=np.bincount(dst, minlength=n).astype(np.int64),
        src=src,
        dst=dst,
        weight=weight,
    )
    ns = len(shard.src_list)
    active = (
        np.flatnonzero(rng.random(ns) < draw(st.floats(0.0, 1.0)))
        if ns
        else np.empty(0, dtype=np.int64)
    )
    d = draw(st.sampled_from([0, 3]))  # scalar or width-3 vector payloads
    return shard, active, rng, d


CASES = [
    ("sum", 0.0, "mul", False),
    ("sum", 0.0, "mul", True),
    ("min", np.inf, "add", True),  # tropical SSSP shape
    ("min", np.iinfo(np.int64).max * 1.0, "mul", False),
    ("max", 0.0, "mul", False),
]


@settings(max_examples=120, deadline=None)
@given(data=shard_and_frontier())
def test_sparse_matches_dense_masked(data):
    shard, active, rng, d = data
    ns = len(shard.src_list)
    for combine, identity, weight_op, use_w in CASES:
        shape = (ns, d) if d else ns
        sig = rng.integers(1, 9, size=shape).astype(np.float64)
        masked = np.full(shape, identity)
        masked[active] = sig[active]
        dense = csr.scatter_partials(
            shard,
            masked,
            combine=combine,
            identity=identity,
            use_weights=use_w,
            weight_op=weight_op,
        )
        pos, vals = csr.scatter_partials_sparse(
            shard,
            masked,
            active,
            combine=combine,
            identity=identity,
            use_weights=use_w,
            weight_op=weight_op,
        )
        G = len(shard.group_starts)
        expect = np.full((G, d) if d else G, identity)
        if len(pos):
            expect[pos] = vals
        assert dense.shape == expect.shape
        assert np.array_equal(dense, expect), (combine, weight_op, d)
