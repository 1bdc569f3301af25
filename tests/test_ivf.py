"""IVF ANN: k-means index build (DataFrame-op Lloyd iterations),
cluster-probed top-k, recall vs brute force on the real embeddings."""

import pytest
from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark.pipeline import similarity


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


def test_kmeans_converges_and_is_deterministic(spark, emb):
    c1 = similarity.kmeans_centroids(emb, k=4, iters=3)
    c2 = similarity.kmeans_centroids(emb, k=4, iters=3)
    assert c1 == c2  # fully deterministic
    assert len(c1) == 4 and all(len(c) == 64 for c in c1)
    # centroids moved away from the raw init vectors
    init = [r.embedding for r in emb.orderBy("vec_id").limit(4).collect()]
    assert any(
        abs(c1[i][0] - float(init[i][0])) > 1e-9 for i in range(4)
    )


def test_ivf_assignment_partitions_corpus(spark, emb):
    cents = similarity.kmeans_centroids(emb, k=4, iters=2)
    assigned = similarity.ivf_assign(emb, cents, nprobe=1)
    n = emb.count()
    assert assigned.count() == n  # every vector in exactly one cell
    sizes = assigned.groupBy("cluster").count().collect()
    assert len(sizes) >= 2  # corpus actually split


def test_ivf_recall_vs_brute_force(spark, emb):
    queries = emb.where(F.col("vec_id") < 10)
    exact = similarity.brute_force_topk(emb, queries, k=5)
    approx = similarity.ivf_topk(emb, queries, k=5, nlist=8, nprobe=4, iters=3)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # random 64-dim embeddings are a worst case for IVF; probing half
    # the cells must still recover a solid share of true neighbors
    assert recall >= 0.5, recall
    # and every query must produce k results
    assert len(a) == len(e)
