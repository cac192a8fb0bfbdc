"""HyperLogLog distinct sketches + deterministic bottom-k sampling."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from flashray.datapipe import sketches


def test_hll_accuracy_large():
    n = 5000
    df = pd.DataFrame({"v": [f"item-{i}" for i in range(n)]})
    est = sketches.approx_distinct(rd.from_pandas(df), "v", p=12)
    # p=12 -> ~1.6% rel std error; 5 sigma bound
    assert abs(est - n) / n < 0.08


def test_hll_small_range_linear_counting():
    n = 100
    df = pd.DataFrame({"v": [f"x{i}" for i in range(n)] * 3})  # dups collapse
    est = sketches.approx_distinct(rd.from_pandas(df), "v", p=12)
    assert abs(est - n) / n < 0.05


def test_hll_partition_invariant():
    df = pd.DataFrame({"v": [f"k{i % 700}" for i in range(5000)]})
    ds = rd.from_pandas(df)
    a = sketches.approx_distinct(ds.repartition(1), "v", p=12)
    b = sketches.approx_distinct(ds.repartition(13), "v", p=12)
    assert a == b  # bit-identical: registers max-merge associatively


def test_hll_words():
    texts = ["the quick brown fox", "the lazy dog", "quick dog"]
    df = pd.DataFrame({"text": texts})
    est = sketches.approx_distinct_words(rd.from_pandas(df), "text", p=12)
    # 7 distinct words, linear-counting regime: near exact
    assert abs(est - 7) < 1


def test_hll_by_key():
    rows = []
    expected = {}
    for k, n in [("a", 10), ("b", 250), ("c", 1)]:
        expected[k] = n
        for i in range(n):
            rows.append({"k": k, "v": f"{k}-{i}"})
            rows.append({"k": k, "v": f"{k}-{i}"})  # dup
    df = pd.DataFrame(rows)
    out = (
        sketches.approx_distinct_by_key(rd.from_pandas(df).repartition(5), "k", "v", p=12)
        .to_pandas()
        .set_index("k")["approx_distinct"]
    )
    for k, n in expected.items():
        assert abs(out[k] - n) / n < 0.05, (k, out[k], n)


def test_bottomk_sample():
    df = pd.DataFrame({"id": np.arange(1000), "payload": np.arange(1000) * 2})
    ds = rd.from_pandas(df)
    s1 = sketches.bottomk_sample(ds.repartition(3), 50, "id").to_pandas()
    s2 = sketches.bottomk_sample(ds.repartition(11), 50, "id").to_pandas()
    assert len(s1) == 50
    # partition-invariant and deterministic
    assert sorted(s1["id"]) == sorted(s2["id"])
    # subset of the input, payload intact
    assert (s1["payload"] == s1["id"] * 2).all()
    # a different salt draws a different (but equally deterministic) sample
    s3 = sketches.bottomk_sample(ds, 50, "id", salt="other").to_pandas()
    assert sorted(s3["id"]) != sorted(s1["id"])


def test_hash_split_deterministic_and_proportional(ray_session):
    import hashlib

    from flashray.datapipe.sketches import hash_split

    n = 4000
    ds = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(n)}))
    out = hash_split(
        ds, key_col="doc_id",
        fractions={"train": 0.8, "val": 0.1, "test": 0.1},
    ).to_pandas()
    # independent replay with hashlib + exact integer bands
    def band(v):
        h = int.from_bytes(
            hashlib.sha256(str(v).encode()).digest()[:8], "big"
        )
        if h < int(0.8 * (1 << 64)):
            return "train"
        if h < int((0.8 + 0.1) * (1 << 64)):
            return "val"
        return "test"

    want = [band(v) for v in out["doc_id"]]
    assert list(out["split"]) == want
    counts = out["split"].value_counts()
    assert abs(counts["train"] / n - 0.8) < 0.03
    # partition-layout invariance
    out2 = hash_split(
        ds.repartition(7), key_col="doc_id",
        fractions={"train": 0.8, "val": 0.1, "test": 0.1},
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out2["split"]) == list(
        out.sort_values("doc_id")["split"]
    )
    # splitmix scale path: deterministic, roughly proportional
    sm = hash_split(
        ds, key_col="doc_id", hash_fn="splitmix",
        fractions={"train": 0.5, "val": 0.5},
    ).to_pandas()
    c = sm["split"].value_counts()
    assert abs(c["train"] / n - 0.5) < 0.05


def test_exact_quantiles_match_duckdb_rule(ray_session):
    import duckdb

    from flashray.datapipe.sketches import exact_quantiles

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 1000, 997).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(9)
    qs = [0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 0.999, 1.0]
    got = exact_quantiles(ds, "v", qs)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": vals}))
    for q in qs:
        want = con.execute(f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
        assert got[q] == float(want), (q, got[q], want)


def test_global_rank_matches_duckdb():
    import duckdb
    import ray.data as rd

    from flashray.datapipe.sketches import global_rank

    ev = "/root/testdata/sf0.001/events.parquet"
    got = global_rank(
        rd.read_parquet(ev, columns=["event_id", "value"]),
        ["value", "event_id"],
        ntile=4,
    ).to_pandas()
    want = duckdb.sql(
        f"""
        WITH r AS (SELECT event_id, value,
                   ROW_NUMBER() OVER (ORDER BY value, event_id) AS rank,
                   COUNT(*) OVER () AS n
                   FROM read_parquet('{ev}'))
        SELECT event_id, value, rank, 1 + (rank - 1) * 4 // n AS ntile FROM r
        """
    ).df()
    cols = ["event_id", "value", "rank", "ntile"]
    a = got[cols].sort_values("event_id").reset_index(drop=True)
    b = want[cols].sort_values("event_id").reset_index(drop=True)
    assert (a["rank"].to_numpy() == b["rank"].to_numpy()).all()
    assert (a["ntile"].to_numpy() == b["ntile"].to_numpy()).all()
    # ranks are a permutation of 1..n
    assert sorted(got["rank"]) == list(range(1, len(got) + 1))


def test_global_rank_descending_and_empty():
    import pandas as pd
    import ray.data as rd

    from flashray.datapipe.sketches import global_rank

    df = pd.DataFrame(
        {"k": np.array([5, 1, 3, 2, 4], dtype="int64"),
         "i": np.arange(5, dtype="int64")}
    )
    got = global_rank(
        rd.from_pandas(df).repartition(3), ["k", "i"], descending=[True, False]
    ).to_pandas().sort_values("rank")
    assert got["k"].tolist() == [5, 4, 3, 2, 1]


def test_stratified_sample_deterministic_and_uniformish():
    import duckdb
    import ray.data as rd

    from flashray.datapipe.sketches import stratified_sample

    docs = "/root/testdata/sf0.001/documents.parquet"
    got = stratified_sample(
        rd.read_parquet(docs, columns=["doc_id", "lang"]),
        ["lang"], 4, "doc_id", num_buckets=4,
    ).to_pandas()
    want = duckdb.sql(
        f"""
        SELECT doc_id, lang FROM read_parquet('{docs}')
        QUALIFY ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
          CAST(concat('0x', substr(sha256(CAST(doc_id AS VARCHAR)), 1, 16))
               AS UBIGINT), doc_id) <= 4
        """
    ).df()
    cols = ["lang", "doc_id"]
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b.astype(a.dtypes.to_dict()))
    # repartitioning must not change the sample
    got2 = stratified_sample(
        rd.read_parquet(docs, columns=["doc_id", "lang"]).repartition(7),
        ["lang"], 4, "doc_id", num_buckets=16,
    ).to_pandas()
    a2 = got2[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(a2)


def test_pack_sequences_matches_duckdb():
    import duckdb
    import pandas as pd
    import ray.data as rd

    from flashray.datapipe.sketches import pack_sequences

    rng = np.random.default_rng(21)
    df = pd.DataFrame(
        {
            "rid": np.arange(300, dtype="int64"),
            "n_tokens": rng.integers(1, 40, 300).astype("int64"),
        }
    )
    got = pack_sequences(
        rd.from_pandas(df).repartition(7), ["rid"], "n_tokens", 128
    ).to_pandas()
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        """
        SELECT rid, n_tokens,
               (SUM(n_tokens) OVER (ORDER BY rid) - n_tokens) // 128 AS pack_id,
               (SUM(n_tokens) OVER (ORDER BY rid) - n_tokens) % 128
                 AS pack_offset
        FROM t
        """
    ).df()
    cols = ["rid", "n_tokens", "pack_id", "pack_offset"]
    a = got[cols].sort_values("rid").reset_index(drop=True)
    b = want[cols].sort_values("rid").reset_index(drop=True)
    for c in cols:
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c
    # pack ids are contiguous from 0
    assert a["pack_id"].min() == 0
    total = int(df["n_tokens"].sum())
    assert a["pack_id"].max() == (total - int(df["n_tokens"].iloc[-1])) // 128


def test_global_rank_and_cumsum_tiny_many_partitions():
    # partitions > rows: the range-partitioned sort emits EMPTY blocks;
    # summary/assign must skip them instead of raising on b.iloc[0]
    df = pd.DataFrame({"id": [3, 1, 2], "v": [10, 20, 30]})
    ds = rd.from_pandas(df).repartition(8)
    ranked = sketches.global_rank(ds, ["id"]).to_pandas()
    ranked = ranked.sort_values("id").reset_index(drop=True)
    assert list(ranked["rank"]) == [1, 2, 3]
    cum = sketches.global_cumsum(ds, ["id"], "v").to_pandas()
    cum = cum.sort_values("id").reset_index(drop=True)
    assert list(cum["cumsum_before"]) == [0, 20, 50]


def test_frequent_terms_exact_two_pass():
    from collections import Counter

    from flashray.datapipe.sketches import frequent_terms

    rng = np.random.default_rng(9)
    vocab = [f"t{i}" for i in range(40)]
    probs = np.arange(40, 0, -1, dtype=np.float64)
    probs /= probs.sum()
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(3, 30)), p=probs))
        for _ in range(120)
    ]
    df = pd.DataFrame(
        {"doc_id": np.arange(120, dtype=np.int64), "text": texts}
    )
    cnt = Counter(w for t in texts for w in t.split())
    n = sum(cnt.values())
    import math

    for th in (0.02, 0.05):
        got = frequent_terms(
            rd.from_pandas(df), threshold=th, num_buckets=8
        ).to_pandas()
        req = math.ceil(th * n)
        want = sorted((t, c) for t, c in cnt.items() if c >= req)
        if not want:
            # 0.05 exercises the empty-answer edge (top term ~0.049 of
            # mass); Ray's to_pandas() drops columns on a fully-empty
            # Dataset, so only the row count is assertable
            assert len(got) == 0
            continue
        got = got.sort_values("term").reset_index(drop=True)
        assert list(zip(got["term"], got["cnt"])) == want
    # k in [1/th, 2/th): wider candidate set, result must stay exact
    th = 0.02
    req = math.ceil(th * n)
    k_mid = math.ceil(n / req) + 1
    got = (
        frequent_terms(rd.from_pandas(df), threshold=th, k=k_mid,
                       num_buckets=8)
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    want = sorted((t, c) for t, c in cnt.items() if c >= req)
    assert list(zip(got["term"], got["cnt"])) == want
    # a k that voids the superset guarantee is rejected, never silent
    with pytest.raises(Exception, match="too small"):
        frequent_terms(rd.from_pandas(df), threshold=th, k=2,
                       num_buckets=8).to_pandas()


def test_cms_term_estimates_upper_bound_and_sql_semantics():
    from collections import Counter

    from flashray.datapipe.sketches import cms_term_estimates

    rng = np.random.default_rng(21)
    vocab = [f"w{i}" for i in range(50)]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(3, 25))))
        for _ in range(100)
    ]
    df = pd.DataFrame(
        {"doc_id": np.arange(100, dtype=np.int64), "text": texts}
    )
    cnt = Counter(t for s in texts for t in s.split())
    probes = ["w0", "w7", "w49", "absent"]
    got = cms_term_estimates(
        rd.from_pandas(df), probes, w=256, d=4, text_col="text"
    )
    assert list(got["term"]) == sorted(probes)
    est = dict(zip(got["term"], got["est"]))
    n = sum(cnt.values())
    for p in probes:
        true = cnt.get(p, 0)
        assert est[p] >= true          # CMS never under-counts
        assert est[p] <= true + n      # sane upper bound
    # python replay of the register matrix agrees exactly
    import hashlib

    m = np.zeros((4, 256), dtype=np.int64)
    for t, c in cnt.items():
        for j in range(4):
            h = int.from_bytes(
                hashlib.sha256(f"{j}|{t}".encode()).digest()[:8], "big"
            )
            m[j, h % 256] += c
    for p in probes:
        cells = [
            m[j, int.from_bytes(
                hashlib.sha256(f"{j}|{p}".encode()).digest()[:8], "big"
            ) % 256]
            for j in range(4)
        ]
        assert est[p] == min(cells)


def test_histogram_quantiles_within_bin_width():
    import ray.data as rd

    from flashray.datapipe.sketches import histogram_quantiles

    rng = np.random.default_rng(13)
    x = rng.normal(50.0, 12.0, size=5000).round(4)
    df = pd.DataFrame({"value": x})
    qs = [0.01, 0.1, 0.5, 0.9, 0.99]
    got = histogram_quantiles(rd.from_pandas(df), "value", qs, bins=512)
    width = (x.max() - x.min()) / 512
    for q, est in zip(got["q"], got["est"]):
        true = np.quantile(x, q)
        assert abs(est - true) <= width + 1e-9, (q, est, true)


def test_histogram_quantiles_partition_invariant_exact():
    import ray.data as rd

    from flashray.datapipe.sketches import histogram_quantiles

    rng = np.random.default_rng(29)
    df = pd.DataFrame({"value": rng.uniform(-3, 7, size=2000)})
    qs = [0.25, 0.5, 0.75]
    a = histogram_quantiles(rd.from_pandas(df), "value", qs, bins=256)
    b = histogram_quantiles(
        rd.from_pandas(df).repartition(11), "value", qs, bins=256
    )
    pd.testing.assert_frame_equal(a, b)  # bit-identical, not approximate


def test_histogram_quantiles_degenerate_constant():
    import ray.data as rd

    from flashray.datapipe.sketches import histogram_quantiles

    df = pd.DataFrame({"value": np.full(100, 3.25)})
    got = histogram_quantiles(rd.from_pandas(df), "value", [0.1, 0.9])
    assert (got["est"] == 3.25).all()


def _ws_replay(df, k, salt="ws"):
    import hashlib

    d = df[df["w"] > 0].copy()
    h63 = np.array(
        [
            int.from_bytes(
                hashlib.sha256(f"{salt}|{i}".encode()).digest()[:8], "big"
            )
            >> 1
            for i in d["id"]
        ],
        dtype=np.uint64,
    )
    u = (h63.astype(np.float64) + 0.5) / 2.0**63
    d["__key"] = np.round(-np.log(u) / d["w"].to_numpy(np.float64), 6)
    return (
        d.sort_values(["__key", "id"]).head(k).reset_index(drop=True)
    )


def test_weighted_sample_matches_replay_and_invariance():
    import ray.data as rd

    from flashray.datapipe.sketches import weighted_sample

    rng = np.random.default_rng(17)
    df = pd.DataFrame(
        {
            "id": np.arange(800, dtype=np.int64),
            "w": np.r_[
                rng.uniform(0.1, 5.0, 790), np.zeros(5), -np.ones(5)
            ],
        }
    )
    got = (
        weighted_sample(
            rd.from_pandas(df), 50, weight_col="w", id_col="id"
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    want = _ws_replay(df, 50)
    pd.testing.assert_frame_equal(
        got[["id", "w", "__key"]], want[["id", "w", "__key"]]
    )
    got2 = (
        weighted_sample(
            rd.from_pandas(df).repartition(13), 50,
            weight_col="w", id_col="id",
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, got2)
    assert (got["w"] > 0).all()


def test_weighted_sample_bias_toward_heavy_rows():
    import ray.data as rd

    from flashray.datapipe.sketches import weighted_sample

    # half the rows carry 20x the weight: they should dominate the sample
    df = pd.DataFrame(
        {
            "id": np.arange(1000, dtype=np.int64),
            "w": np.where(np.arange(1000) < 500, 20.0, 1.0),
        }
    )
    got = weighted_sample(
        rd.from_pandas(df), 100, weight_col="w", id_col="id"
    ).to_pandas()
    assert (got["id"] < 500).mean() > 0.85
