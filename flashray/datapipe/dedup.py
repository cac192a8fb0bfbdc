"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Ray-Data-first shapes (see /opt/skills/guides/ray_guide.md "Aggregation at
scale"): signatures are computed in stateful actor-pool ``map_batches``
stages (permutation tables built once per actor), candidates come from a
``groupby`` on LSH bucket keys, verification happens inside the bucket
group, and duplicate *groups* are the connected components of the verified
pair graph — computed with this repo's own WCC engine when the pair set is
large, or driver-side union-find when it is small.

Determinism: all hashing is seeded/stable (splitmix64 over stable word ids);
results are identical across runs and parallelism levels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Min

from flashray.ids import _splitmix64, id64

_MERSENNE61 = np.uint64((1 << 61) - 1)


def _word_codes(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit code per token (unique tokens hashed once)."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    uniq, inv = np.unique(np.asarray(tokens, dtype=object), return_inverse=True)
    codes = np.fromiter(
        (id64("w:" + t) for t in uniq), dtype=np.uint64, count=len(uniq)
    )
    return codes[inv]


def _shingle_hashes(codes: np.ndarray, n: int) -> np.ndarray:
    """Hashes of word n-grams: splitmix-combine of n consecutive word codes
    (vectorized sliding window)."""
    if len(codes) < n:
        # degenerate doc: hash the whole token sequence as one shingle
        h = np.uint64(0)
        with np.errstate(over="ignore"):
            for c in codes:
                h = _splitmix64(np.asarray([h ^ c]))[0]
        return np.asarray([h], dtype=np.uint64)
    with np.errstate(over="ignore"):
        acc = codes[: len(codes) - n + 1].copy()
        for i in range(1, n):
            acc = _splitmix64(acc ^ codes[i : len(codes) - n + 1 + i])
    return np.unique(acc)


class MinHashSignatures:
    """Adds a ``signature`` column (fixed-size list<uint64>) of MinHash
    values over word n-gram shingles. Permutations (a·x+b mod 2^61-1) are
    generated once per actor from a fixed seed."""

    def __init__(self, *, text_col="text", num_perm=128, shingle_n=3, seed=42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE61, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE61, size=num_perm, dtype=np.uint64)
        self.text_col = text_col
        self.num_perm = num_perm
        self.n = shingle_n

    def _sig(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(_word_codes((text or "").split()), self.n)
        if len(sh) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        with np.errstate(over="ignore"):
            # (k, m) = perms × shingles; modular arithmetic in uint64
            vals = (self.a[:, None] * (sh[None, :] % _MERSENNE61) + self.b[:, None]) % _MERSENNE61
        return vals.min(axis=1).astype(np.uint64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["signature"] = batch[self.text_col].map(self._sig)
        return batch


def _band_rows(
    batch: pd.DataFrame, *, id_col: str, bands: int, rows_per_band: int
) -> pd.DataFrame:
    """Explode signatures to (bucket, doc_id, signature) LSH-band rows."""
    out_bucket, out_id, out_sig = [], [], []
    for _, row in batch.iterrows():
        sig = row["signature"]
        for b in range(bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            with np.errstate(over="ignore"):
                h = np.uint64(b)
                for v in chunk:
                    h = _splitmix64(np.asarray([h ^ np.uint64(v)]))[0]
            out_bucket.append(np.int64(h & np.uint64(0x7FFF_FFFF_FFFF_FFFF)))
            out_id.append(row[id_col])
            out_sig.append(sig)
    return pd.DataFrame({"bucket": out_bucket, "doc_id": out_id, "signature": out_sig})


def _bucket_pairs(group: pd.DataFrame, *, threshold: float) -> pd.DataFrame:
    """Verify candidate pairs within one LSH bucket by estimated Jaccard
    (signature agreement rate)."""
    n = len(group)
    if n < 2:
        return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
                             "similarity": pd.Series(dtype="float64")})
    ids = group["doc_id"].to_numpy()
    sigs = np.stack(group["signature"].to_numpy())
    order = np.argsort(ids)
    ids, sigs = ids[order], sigs[order]
    out_a, out_b, out_s = [], [], []
    for i in range(n):
        agree = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
        hit = np.flatnonzero(agree >= threshold)
        for j in hit:
            out_a.append(ids[i])
            out_b.append(ids[i + 1 + j])
            out_s.append(float(agree[j]))
    return pd.DataFrame({"a": out_a, "b": out_b, "similarity": out_s})


def candidate_pairs_minhash(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.7,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """MinHash+LSH near-duplicate pairs (a < b, estimated Jaccard ≥
    threshold). Distinct pairs may surface from several bands; deduped."""
    rows_per_band = num_perm // bands
    sigs = ds.select_columns([id_col, text_col]).map_batches(
        MinHashSignatures,
        fn_constructor_kwargs={
            "text_col": text_col,
            "num_perm": num_perm,
            "shingle_n": shingle_n,
        },
        batch_format="pandas",
        concurrency=concurrency,
    )
    bands_ds = sigs.map_batches(
        _band_rows,
        fn_kwargs={"id_col": id_col, "bands": bands, "rows_per_band": rows_per_band},
        batch_format="pandas",
    )
    pairs = bands_ds.groupby("bucket").map_groups(
        _bucket_pairs, fn_kwargs={"threshold": threshold}, batch_format="pandas"
    )
    from ray.data.aggregate import Max

    return pairs.groupby(["a", "b"]).aggregate(Max("similarity", alias_name="similarity"))


def duplicate_groups(pairs: ray.data.Dataset, *, scratch_dir: str | None = None) -> pd.DataFrame:
    """Connected components of the verified pair graph → (doc_id, group)
    with group = min doc_id of the component. Uses driver union-find for
    small pair sets; for web-scale pair sets pass ``scratch_dir`` to run the
    repo's own WCC engine over the pair edges instead."""
    if scratch_dir is not None:
        import ray.data as rd

        from flashray import algorithms
        from flashray.build import build_graph
        from flashray.fixtures import edges_table

        def to_edges(b: pa.Table) -> pa.Table:
            a = b["a"].to_numpy(zero_copy_only=False)
            bb = b["b"].to_numpy(zero_copy_only=False)
            return edges_table(
                np.concatenate([a, bb]), np.concatenate([bb, a])
            )

        g = build_graph(
            pairs.map_batches(to_edges, batch_format="pyarrow", zero_copy_batch=True),
            scratch_dir,
            num_partitions=8,
        )
        df = algorithms.wcc(g)
        return df.rename(columns={"vertex_id": "doc_id", "value": "group"})

    pdf = pairs.to_pandas()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pdf["a"].astype(int), pdf["b"].astype(int)):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = sorted((doc, find(doc)) for doc in parent)
    return pd.DataFrame(rows, columns=["doc_id", "group"]).astype("int64")


def exact_dedup(
    ds: ray.data.Dataset, *, text_col: str = "text", id_col: str = "doc_id",
    concurrency: int = 4,
) -> ray.data.Dataset:
    """Exact dedup: one surviving row id per distinct text (min id), via a
    content-hash groupby — (text_hash, keep_id, n_copies)."""
    from flashray.datapipe.textstats import Fingerprint

    from ray.data.aggregate import Count

    hashed = ds.select_columns([id_col, text_col]).map_batches(
        Fingerprint,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pandas",
        concurrency=concurrency,
    )
    agg = hashed.groupby("fingerprint").aggregate(
        Min(id_col, alias_name="keep_id"),
        Count(alias_name="n_copies"),
    )
    return agg.map_batches(
        lambda b: b.rename_columns(
            ["text_hash" if c == "fingerprint" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


class SimHashSignatures:
    """64-bit SimHash over word hashes: bit b of the signature is the sign
    of the sum of ±1 votes from each token's hash bit b."""

    def __init__(self, *, text_col: str = "text"):
        self.text_col = text_col
        self.bits = np.arange(64, dtype=np.uint64)

    def _sig(self, text: str) -> np.int64:
        codes = _word_codes((text or "").split())
        if len(codes) == 0:
            return np.int64(0)
        bits = ((codes[:, None] >> self.bits[None, :]) & np.uint64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        sig = np.uint64(0)
        with np.errstate(over="ignore"):
            for b in np.flatnonzero(votes > 0):
                sig |= np.uint64(1) << np.uint64(b)
        return np.int64(sig & np.uint64(0x7FFF_FFFF_FFFF_FFFF))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["simhash"] = batch[self.text_col].map(self._sig).astype("int64")
        return batch


def candidate_pairs_simhash(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """SimHash near-dup pairs: bucket by each of 4 16-bit chunks (any pair
    within hamming ≤ 3 of 64 bits agrees on ≥ 1 chunk), verify hamming."""
    sigs = ds.select_columns([id_col, text_col]).map_batches(
        SimHashSignatures,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pandas",
        concurrency=concurrency,
    )

    def bands(batch: pd.DataFrame) -> pd.DataFrame:
        sig = batch["simhash"].to_numpy().astype(np.uint64)
        ids = batch[id_col].to_numpy()
        out = []
        for c in range(4):
            chunk = (sig >> np.uint64(16 * c)) & np.uint64(0xFFFF)
            bucket = (np.int64(c) << np.int64(16)) | chunk.astype(np.int64)
            out.append(pd.DataFrame({"bucket": bucket, "doc_id": ids, "simhash": sig.astype(np.int64)}))
        return pd.concat(out, ignore_index=True)

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        n = len(group)
        if n < 2:
            return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
                                 "hamming": pd.Series(dtype="int64")})
        ids = group["doc_id"].to_numpy()
        sig = group["simhash"].to_numpy().astype(np.uint64)
        order = np.argsort(ids)
        ids, sig = ids[order], sig[order]
        out_a, out_b, out_h = [], [], []
        for i in range(n):
            x = sig[i + 1 :] ^ sig[i]
            ham = np.array([bin(int(v)).count("1") for v in x])
            hit = np.flatnonzero(ham <= max_hamming)
            for j in hit:
                out_a.append(ids[i]); out_b.append(ids[i + 1 + j]); out_h.append(int(ham[j]))
        return pd.DataFrame({"a": out_a, "b": out_b, "hamming": out_h})

    pairs = (
        sigs.map_batches(bands, batch_format="pandas")
        .groupby("bucket")
        .map_groups(verify, batch_format="pandas")
    )
    return pairs.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming"))


def candidate_pairs_ngram_jaccard(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
    num_perm: int = 128,
    bands: int = 32,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """Exact n-gram Jaccard pairs: MinHash-LSH proposes candidates (loose
    bands), then the true Jaccard over shingle sets is computed inside the
    bucket (texts travel with the bucket rows)."""
    rows_per_band = num_perm // bands
    sigs = ds.select_columns([id_col, text_col]).map_batches(
        MinHashSignatures,
        fn_constructor_kwargs={
            "text_col": text_col,
            "num_perm": num_perm,
            "shingle_n": shingle_n,
        },
        batch_format="pandas",
        concurrency=concurrency,
    )

    def band_rows(batch: pd.DataFrame) -> pd.DataFrame:
        out = _band_rows(batch, id_col=id_col, bands=bands, rows_per_band=rows_per_band)
        texts = dict(zip(batch[id_col], batch[text_col]))
        out["text"] = out["doc_id"].map(texts)
        return out.drop(columns=["signature"])

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        n = len(group)
        if n < 2:
            return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
                                 "jaccard": pd.Series(dtype="float64")})
        g = group.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        shingles = [
            set(_shingle_hashes(_word_codes((t or "").split()), shingle_n).tolist())
            for t in g["text"]
        ]
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = len(shingles[i] & shingles[j])
                union = len(shingles[i] | shingles[j])
                jac = inter / union if union else 0.0
                if jac >= threshold:
                    out_a.append(ids[i]); out_b.append(ids[j]); out_j.append(jac)
        return pd.DataFrame({"a": out_a, "b": out_b, "jaccard": out_j})

    from ray.data.aggregate import Max

    pairs = (
        sigs.map_batches(band_rows, batch_format="pandas")
        .groupby("bucket")
        .map_groups(verify, batch_format="pandas")
    )
    return pairs.groupby(["a", "b"]).aggregate(Max("jaccard", alias_name="jaccard"))
