

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
