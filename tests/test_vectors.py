

def test_ann_rerank_recall_and_plan(spark):
    """Two-stage rerank: with c = N (candidates = whole store) the
    result must equal exact cosine top-k bit-for-bit; with a narrow c
    the top-k still comes back exact-scored and ordered; the candidate
    cut is a TakeOrdered, not a full sort."""
    import random

    from vyntr_spark.operators.vectors import ann_rerank_topk, cosine_topk
    from vyntr_spark.plans import audit

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(300)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qv = rows[0][1]

    exact = cosine_topk(emb, qv, k=10).collect()
    wide = ann_rerank_topk(emb, qv, k=10, c=300).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in wide] == \
        [(r["vec_id"], r["cos_sim"]) for r in exact]

    narrow = ann_rerank_topk(emb, qv, k=10, c=50)
    assert audit.has_take_ordered(narrow)
    got = narrow.collect()
    assert len(got) == 10
    # every returned score is the EXACT cosine for that id
    exact_all = {r["vec_id"]: r["cos_sim"]
                 for r in cosine_topk(emb, qv, k=300).collect()}
    for r in got:
        assert r["cos_sim"] == exact_all[r["vec_id"]]
    # scores descend
    scores = [r["cos_sim"] for r in got]
    assert scores == sorted(scores, reverse=True)


def test_ann_rerank_serves_materialized_int8_store(spark, tmp_path):
    """Stage 1 must scan ONLY the materialized int8_codes table — the
    4x-IO point of the two-stage design: the float `embedding` column
    may not appear in the candidate cut's scan (plan-pinned via
    ReadSchema), and serving from the written store is bit-identical to
    deriving codes on the fly."""
    import random

    from vyntr_spark.operators.vectors import ann_rerank_topk, int8_codes
    from vyntr_spark.plans import audit

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(32)]) for i in range(400)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    emb_path = str(tmp_path / "emb")
    store_path = str(tmp_path / "int8_store")
    emb.write.parquet(emb_path)
    int8_codes(emb).write.parquet(store_path)

    emb_pq = spark.read.parquet(emb_path)
    store_pq = spark.read.parquet(store_path)
    qv = rows[0][1]

    served = ann_rerank_topk(emb_pq, qv, k=10, c=40, store=store_pq)
    onthefly = ann_rerank_topk(emb_pq, qv, k=10, c=40)
    assert [(r["vec_id"], r["cos_sim"]) for r in served.collect()] == \
        [(r["vec_id"], r["cos_sim"]) for r in onthefly.collect()]

    # plan pin: exactly two parquet scans — the stage-1 store scan
    # (codes+scale+vec_id, NO embedding) and the stage-2 float rejoin
    plan = audit.formatted_plan(served)
    schemas = [ln.strip() for ln in plan.splitlines()
               if ln.strip().startswith("ReadSchema:")]
    assert len(schemas) == 2, plan
    store_scans = [s for s in schemas if "codes" in s]
    assert store_scans and all("embedding" not in s for s in store_scans)
    # the survivors come back by broadcast, and the cut is a TakeOrdered
    assert audit.has_broadcast_join(served)
    assert audit.has_take_ordered(served)
