"""Recall checks for the approximate ANN paths against the exact baseline.

The LSH/IVF entries are rows-only in the driver gate (approximate by
construction), so their quality evidence lives here: top-k recall against
the brute-force exact results must clear a floor that random bucketing
could not (random 25%-of-corpus scan would land ~0.25 recall).
"""

from squirtle_spark.registry import load_all


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["q_id"], set()).add(r["c_id"])
    return out


def _recall(approx, exact):
    hits = total = 0
    for q, exact_ids in exact.items():
        total += len(exact_ids)
        hits += len(exact_ids & approx.get(q, set()))
    return hits / total


def test_ivf_recall_vs_brute(spark, sf_dir):
    qs = load_all()
    exact = _topk_sets(qs["ann_cosine_topk"].spark_fn(spark, sf_dir))
    approx = _topk_sets(qs["ann_ivf_topk"].spark_fn(spark, sf_dir))
    r = _recall(approx, exact)
    assert r >= 0.5, f"IVF recall@5 {r:.2f} below floor"


def test_lsh_recall_vs_brute(spark, sf_dir):
    qs = load_all()
    exact = _topk_sets(qs["ann_cosine_topk"].spark_fn(spark, sf_dir))
    approx = _topk_sets(qs["ann_lsh_topk"].spark_fn(spark, sf_dir))
    r = _recall(approx, exact)
    assert r >= 0.3, f"LSH recall@5 {r:.2f} below floor"
