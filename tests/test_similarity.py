"""Similarity search: brute-force cosine top-k, LSH buckets, near-dup pairs."""

import math

import pytest
from pyspark.sql import functions as F

from crawlee_spark.operators.similarity import (
    cosine_topk,
    embedding_neardup_pairs,
    hyperplane_weights,
    lsh_ann_topk,
    with_lsh_buckets,
)

DIM = 4
CORPUS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0, 0.0]),   # close to 0
    (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal to 0
    (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite of 0
    (4, [1.0, 0.0, 0.0, 0.0]),   # duplicate of 0
    (5, [0.5, 0.5, 0.5, 0.5]),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(CORPUS, "vec_id long, embedding array<float>")


def test_cosine_topk_exact(corpus):
    q = corpus.filter("vec_id = 0").select(F.col("vec_id").alias("query_id"), "embedding")
    rows = cosine_topk(q, corpus, k=3).orderBy("rank").collect()
    assert [r["vec_id"] for r in rows] == [0, 4, 1]  # self, dup (id tie-break), near
    assert rows[0]["score_e6"] == 1_000_000 or rows[0]["score_e6"] == 999_999
    assert rows[0]["rank"] == 1 and rows[2]["rank"] == 3
    # cosine(0, 1) = 0.9/sqrt(0.82)
    expected = 0.9 / math.sqrt(0.81 + 0.01)
    assert abs(rows[2]["score_e6"] / 1e6 - expected) < 1e-5


def test_lsh_bucket_determinism(corpus):
    b1 = {r["vec_id"]: r["bucket"] for r in with_lsh_buckets(corpus, dim=DIM, nbits=4).collect()}
    b2 = {r["vec_id"]: r["bucket"] for r in with_lsh_buckets(corpus, dim=DIM, nbits=4).collect()}
    assert b1 == b2
    assert b1[0] == b1[4]  # identical vectors → identical bucket
    assert all(0 <= v < 16 for v in b1.values())


def test_hyperplane_weights_are_pm1():
    ws = hyperplane_weights(4, DIM)
    assert len(ws) == 4 and all(len(row) == DIM for row in ws)
    assert all(w in (-1, 1) for row in ws for w in row)


def test_lsh_ann_topk_subset_of_exact(corpus):
    q = corpus.filter("vec_id = 0").select(F.col("vec_id").alias("query_id"), "embedding")
    approx = {(r["vec_id"], r["rank"]) for r in lsh_ann_topk(q, corpus, k=3, dim=DIM, nbits=2).collect()}
    # every approx hit is a real corpus vector in the query's bucket, and
    # the duplicate (always same bucket) is found
    assert any(v == 4 for v, _ in approx)
    assert any(v == 0 for v, _ in approx)


def test_embedding_neardup_pairs(corpus):
    pairs = {
        (r["id_a"], r["id_b"]): r["score_e6"]
        for r in embedding_neardup_pairs(corpus, dim=DIM, nbits=2, threshold_e6=990_000).collect()
    }
    assert (0, 4) in pairs  # exact duplicate pair
    assert pairs[(0, 4)] >= 999_999
    assert all(a < b for a, b in pairs)


def test_ivf_topk(corpus, spark):
    from crawlee_spark.operators.similarity import ivf_topk

    q = corpus.filter("vec_id = 0").select(F.col("vec_id").alias("query_id"), "embedding")
    # untrained quantizer (train_iters=0): centroids = vecs 0,1,2; nprobe=1 →
    # query 0 probes its own cell, which holds exactly {0, 4} (the dup pair)
    rows = (
        ivf_topk(q, corpus, k=3, n_centroids=3, nprobe=1, train_iters=0)
        .orderBy("rank")
        .collect()
    )
    got = [r["vec_id"] for r in rows]
    assert got == [0, 4]
    assert rows[0]["score_e6"] >= 999_999
    # nprobe=3 probes every cell → equals exact brute force top-3, trained or not
    from crawlee_spark.operators.similarity import cosine_topk

    exact = [r["vec_id"] for r in cosine_topk(q, corpus, k=3).orderBy("rank").collect()]
    for iters in (0, 2):
        full = [
            r["vec_id"]
            for r in ivf_topk(q, corpus, k=3, n_centroids=3, nprobe=3, train_iters=iters)
            .orderBy("rank")
            .collect()
        ]
        assert full == exact


# ---------------------------------------------------------------------------
# hot-bucket guards + deterministic k-means (round-2)
# ---------------------------------------------------------------------------

def test_neardup_hot_bucket_guard(spark):
    """A boilerplate bucket (many near-identical vectors) above max_bucket is
    dropped — pair count stays bounded instead of quadratic — and the report
    names it."""
    from crawlee_spark.operators.similarity import (
        dropped_buckets,
        embedding_neardup_pairs,
        with_lsh_buckets,
    )

    dim = 8
    hot = [(i, [1.0] * dim) for i in range(50)]           # all in one bucket
    cold = [(1000 + i, [(-1.0) ** i * (j + 1.0) for j in range(dim)]) for i in range(4)]
    df = spark.createDataFrame(hot + cold, "vec_id long, embedding array<float>")

    unguarded = embedding_neardup_pairs(df, dim=dim, nbits=2, threshold_e6=900_000, max_bucket=10_000)
    assert unguarded.count() >= 50 * 49 // 2  # quadratic without a guard

    guarded = embedding_neardup_pairs(df, dim=dim, nbits=2, threshold_e6=900_000, max_bucket=10)
    assert guarded.count() < 50  # hot bucket gone, only small buckets pair

    bucketed = with_lsh_buckets(df.select("vec_id", "embedding"), vec_col="embedding", dim=dim, nbits=2)
    report = dropped_buckets(bucketed, max_bucket=10).collect()
    assert len(report) == 1 and report[0]["size"] >= 50


def test_lsh_ann_bucket_guard(spark):
    from crawlee_spark.operators.similarity import lsh_ann_topk

    dim = 8
    hot = [(i, [1.0] * dim) for i in range(40)]
    df = spark.createDataFrame(hot, "vec_id long, embedding array<float>")
    q = df.filter("vec_id = 0").selectExpr("vec_id as query_id", "embedding")
    full = lsh_ann_topk(q, df, k=5, dim=dim, nbits=2, max_bucket=10_000)
    assert full.count() == 5
    # guard drops the (only, hot) bucket → bounded work, no results
    assert lsh_ann_topk(q, df, k=5, dim=dim, nbits=2, max_bucket=10).count() == 0


def test_kmeans_fit_deterministic_and_improving(spark):
    """kmeans_fit: same input → identical centroids across runs and
    partitionings (exact integer update sums), and Lloyd iterations move
    centroids toward cluster means."""
    from crawlee_spark.operators.similarity import kmeans_fit

    rows = []
    for i in range(60):
        base = [10.0, 0.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 10.0, 0.0, 0.0]
        rows.append((i, [b + (i % 5) * 0.01 for b in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    c1 = kmeans_fit(df, k=2, iters=2)
    c2 = kmeans_fit(df.repartition(13), k=2, iters=2)
    assert c1 == c2  # bit-identical across partition layouts
    # the two clusters separate on the first two axes
    axes = sorted(c[:2].index(max(c[:2])) for c in c1)
    assert axes == [0, 1]
    # iteration 0 centroids are raw vectors (ids 0,1); trained ones are means
    c0 = kmeans_fit(df, k=2, iters=0)
    assert c0 != c1


def test_quantized_topk_integer_scores(spark):
    """int8 quantization: q = floor(v·127/max|v|); top-k ranks by the exact
    integer dot. Identical vectors score qmax²·(nonzero dims); orthogonal
    vectors score 0 and rank below."""
    from crawlee_spark.operators.similarity import quantize_embeddings, quantized_topk

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 0.0]),
            (3, [0.5, 0.5, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    q = spark.createDataFrame(
        [(10, [2.0, 0.0, 0.0, 0.0])], "query_id long, embedding array<float>"
    )
    qz = {r["vec_id"]: r["qvec"] for r in quantize_embeddings(corpus).collect()}
    assert qz[1] == [127, 0, 0, 0]
    assert qz[3] == [127, 127, 0, 0]  # scale normalizes by the vector's own max
    got = {
        (r["query_id"], r["vec_id"]): (r["rank"], r["qdot"])
        for r in quantized_topk(q, corpus, k=3).collect()
    }
    assert got[(10, 1)] == (1, 127 * 127)
    assert got[(10, 3)] == (2, 127 * 127)  # same dot; id tie-break after 1
    assert got[(10, 2)] == (3, 0)


def test_quantize_zero_vector_is_safe(spark):
    from crawlee_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    r = quantize_embeddings(df).collect()[0]
    assert r["qvec"] == [0, 0] and r["qscale"] == 0.0
