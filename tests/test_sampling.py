"""Deterministic sampling operators (operators/sampling.py)."""

import hashlib

from pyspark.sql import functions as F

from vyntr_spark.operators import sampling


def _keyhash(key) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)


def test_sample_deterministic_matches_reference(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    got = sorted(r["doc_id"] for r in
                 sampling.sample_deterministic(df, 0.3).collect())
    want = sorted(i for i in range(1000)
                  if _keyhash(i) < int(0.3 * 16 ** 15))
    assert got == want
    # uniform hash → rate close to the nominal fraction
    assert 0.25 < len(got) / 1000 < 0.35


def test_sample_deterministic_is_partitioning_invariant(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = sorted(r["doc_id"] for r in
               sampling.sample_deterministic(df, 0.5).collect())
    b = sorted(r["doc_id"] for r in
               sampling.sample_deterministic(df.repartition(7), 0.5).collect())
    assert a == b


def test_sample_deterministic_no_shuffle(spark):
    df = spark.range(100).withColumnRenamed("id", "doc_id")
    plan = (sampling.sample_deterministic(df, 0.5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan  # pure filter, rides the scan


def test_stratified_topn_exact_quota(spark):
    rows = [(i, "en" if i % 3 else "de") for i in range(90)] + [(1000, "fr")]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.stratified_topn(df, "lang", 4).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    assert len(by_lang["en"]) == 4 and len(by_lang["de"]) == 4
    assert by_lang["fr"] == [1000]  # stratum smaller than n → all rows
    # smallest-hash-first: replicate the selection in pure python
    want_en = sorted((i for i in range(90) if i % 3),
                     key=lambda i: (_keyhash(i), i))[:4]
    assert sorted(by_lang["en"]) == sorted(want_en)


# ---------------------------------------------------------------------------
# mixture planning + sequence packing
# ---------------------------------------------------------------------------


def test_mixture_weights_temperature_rebalance(spark):
    # head domain 9x the tail's tokens; alpha=1/2 compresses the gap:
    # sqrt(0.9)/ (sqrt(0.9)+sqrt(0.1)) ~= 0.75 vs natural 0.9
    rows = [("head", 900), ("tail", 100)]
    df = spark.createDataFrame(rows, "source string, n_tokens long")
    out = {r["domain"]: r.asDict()
           for r in sampling.mixture_weights(df, budget_tokens=1000).collect()}
    assert out["head"]["nat_share"] == 0.9
    assert out["head"]["target_share"] == 0.75
    assert out["tail"]["target_share"] == 0.25
    # quotas follow the target shares against the budget
    assert out["head"]["token_quota"] == 750
    assert out["tail"]["token_quota"] == 250
    # the tail is upsampled ABOVE its natural rate; head capped below
    assert out["tail"]["sample_rate"] == 1.0  # 250 > 100 available -> cap
    assert out["head"]["sample_rate"] == round(750 / 900, 4)


def test_pack_sequences_offsets_and_boundaries(spark):
    # ctx 10: doc0 (4 tok, win 0), doc1 (5, win 0), doc2 (3, crosses
    # 0->1), doc3 (0-token doc occupies no space but pins to its offset),
    # doc4 (12, spans windows 1->2)
    rows = [(0, 4), (1, 5), (2, 3), (3, 0), (4, 12)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = {r["doc_id"]: r.asDict()
           for r in sampling.pack_sequences(df, ctx_len=10).collect()}
    assert out[0]["token_offset"] == 0 and out[0]["start_window"] == 0
    assert out[0]["crosses_boundary"] is False
    assert out[1]["token_offset"] == 4 and out[1]["end_window"] == 0
    assert out[2]["token_offset"] == 9
    assert out[2]["start_window"] == 0 and out[2]["end_window"] == 1
    assert out[2]["crosses_boundary"] is True
    assert out[3]["token_offset"] == 12 and out[3]["start_window"] == 1
    assert out[3]["end_window"] == 1  # empty doc: greatest(n,1) keeps it sane
    assert out[4]["token_offset"] == 12
    assert out[4]["start_window"] == 1 and out[4]["end_window"] == 2


def test_pack_sequences_sharded_parity_and_plan(spark):
    """The scale path (shard_col) must (a) reproduce the global pack
    byte-for-byte on a 1-shard plan, (b) restart each shard's token
    stream at offset 0, and (c) plan a hash Exchange on the shard key
    instead of the global form's SinglePartition Exchange."""
    from vyntr_spark.plans import audit

    rows = [(i, (i * 7) % 13 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")

    # (a) 1-shard parity: constant shard == the global pack
    one = sampling.pack_sequences(
        df.withColumn("shard", F.lit(0)), ctx_len=32, shard_col="shard"
    ).drop("shard")
    glob = sampling.pack_sequences(df, ctx_len=32)
    assert sorted(map(tuple, one.collect())) == \
        sorted(map(tuple, glob.collect()))

    # (b) per-shard streams: each shard independently packs from 0,
    # matching the global pack of that shard's rows alone
    sharded = sampling.shard_plan(df, n_shards=4)
    packed = sampling.pack_sequences(sharded, ctx_len=32,
                                     shard_col="shard")
    got = {(r["shard"], r["doc_id"]): tuple(r)[2:] for r in packed.collect()}
    for s in range(4):
        sub = sharded.where(F.col("shard") == s).select("doc_id", "n_tokens")
        for r in sampling.pack_sequences(sub, ctx_len=32).collect():
            assert got[(s, r["doc_id"])] == tuple(r)[1:]

    # (c) plan pin: no SinglePartition Exchange in the sharded mode
    plan = audit.executed_plan(packed)
    assert "SinglePartition" not in plan, \
        "sharded pack must partition the window by the shard key"
    assert "SinglePartition" in audit.executed_plan(glob)  # oracle form


def test_shard_plan_deterministic_and_shuffle_free(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    plan = sampling.shard_plan(df, n_shards=8)
    a = {r["doc_id"]: (r["shard"], r["sort_key"]) for r in plan.collect()}
    b = {r["doc_id"]: (r["shard"], r["sort_key"])
         for r in sampling.shard_plan(df.repartition(7), n_shards=8)
         .collect()}
    assert a == b                      # partitioning-invariant
    assert all(0 <= s < 8 for s, _ in a.values())
    assert len({s for s, _ in a.values()}) == 8  # every shard populated
    # salt re-deals the corpus without touching the data
    salted = {r["doc_id"]: r["shard"] for r in
              sampling.shard_plan(df, n_shards=8, salt="ep1").collect()}
    assert salted != {k: s for k, (s, _) in a.items()}
    exec_plan = (sampling.shard_plan(df, 8)
                 ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in exec_plan  # rides the scan


def test_shard_manifest_totals(spark):
    df = spark.createDataFrame([(i, 10 + i % 3) for i in range(200)],
                               "doc_id long, n_tokens int")
    plan = sampling.shard_plan(df, n_shards=4)
    man = sampling.shard_manifest(plan, weight_col="n_tokens").collect()
    assert sum(r["n_docs"] for r in man) == 200
    assert sum(r["total_weight"] for r in man) == sum(
        10 + i % 3 for i in range(200))
    per_shard = {r["shard"]: r for r in man}
    rows = {r["doc_id"]: r for r in plan.collect()}
    for s, m in per_shard.items():
        keys = [r["sort_key"] for r in rows.values() if r["shard"] == s]
        assert (m["min_key"], m["max_key"]) == (min(keys), max(keys))


def test_sampled_quantiles_exact_order_stats(spark):
    # full-data mode (fraction=1): quantiles are the exact ceil(q*n)-th
    # order statistic, replayed in pure Python
    from vyntr_spark.operators.sampling import sampled_quantiles

    import math
    rows = [(i, "a", v) for i, v in enumerate([5, 1, 9, 3, 7])] + \
           [(10 + i, "b", v) for i, v in enumerate([2, 2, 2, 8])] + \
           [(99, "c", None)]
    df = spark.createDataFrame(rows, "doc_id long, source string, v int")
    got = {(r["source"], r["q"]): r["quantile_value"]
           for r in sampled_quantiles(df, "v", "source",
                                      qs=(0.5, 0.9)).collect()}
    for grp, vals in (("a", [1, 3, 5, 7, 9]), ("b", [2, 2, 2, 8])):
        for q in (0.5, 0.9):
            want = float(sorted(vals)[math.ceil(q * len(vals)) - 1])
            assert got[(grp, q)] == want, (grp, q)
    # group with only NULLs contributes no rows
    assert not any(g == "c" for g, _ in got)


def test_dsir_select_matches_python_replica(spark):
    # DSIR hashed-ngram importance weights replayed exactly in pure
    # Python (same md5 buckets, same Laplace micro-nat log-ratio)
    import math

    rows = [
        (1, "tgt", "the quick brown fox jumps"),
        (2, "tgt", "the quick brown dog naps"),
        (3, "raw", "the quick brown fox jumps"),   # looks like target
        (4, "raw", "zzz qqq xxx yyy www"),          # looks nothing like it
        (5, "raw", "the quick cat"),
        (6, "raw", ""),                              # empty -> 0 grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r for r in sampling.dsir_select(
        df, target_source="tgt", n_buckets=64, quota=2).collect()}

    def grams(text):
        toks = [t for t in
                __import__("re").split(r"[^a-z0-9]+", text.lower()) if t]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bucket(g):
        return _keyhash(g) % 64

    ct, cr = {}, {}
    for _, src, text in rows:
        for g in grams(text):
            d = ct if src == "tgt" else cr
            d[bucket(g)] = d.get(bucket(g), 0) + 1
    t_tot, r_tot = sum(ct.values()), sum(cr.values())
    lam = {b: math.floor(math.log(
        ((ct.get(b, 0) + 1) * (r_tot + 64))
        / ((cr.get(b, 0) + 1) * (t_tot + 64))) * 1e6 + 0.5)
        for b in set(ct) | set(cr)}
    for doc_id, src, text in rows:
        gs = grams(text)
        assert out[doc_id]["n_grams"] == len(gs)
        assert out[doc_id]["w_micro"] == sum(lam[bucket(g)] for g in gs)
        assert out[doc_id]["source"] == src
    # target docs are never candidates; top-2 raw docs by weight selected
    assert not out[1]["selected"] and not out[2]["selected"]
    raw_sorted = sorted((r for r in out.values() if r["source"] == "raw"),
                        key=lambda r: (-r["w_micro"], r["doc_id"]))
    want = {r["doc_id"] for r in raw_sorted[:2]}
    assert {d for d, r in out.items() if r["selected"]} == want
    # the target-lookalike raw doc must out-score the gibberish doc
    assert out[3]["w_micro"] > out[4]["w_micro"]
