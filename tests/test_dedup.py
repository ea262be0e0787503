"""Dedup family: exact, n-gram Jaccard, MinHash LSH, SimHash."""

import pytest
from pyspark.sql import functions as F

from crawlee_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingles_col,
    simhash_pairs,
    with_simhash,
)

DOCS = [
    # (doc_id, source, text)
    (1, "a", "the quick brown fox jumps over the lazy dog"),
    (2, "a", "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (3, "a", "the quick brown fox jumps over the lazy dog today"),  # near dup
    (4, "a", "completely different words about spark engines and shuffles"),
    (5, "b", "another host entirely separate content block"),
    (6, "b", "another host entirely separate content block"),  # exact dup of 5
    (7, "b", "short doc"),  # < 3 tokens → whole-text shingle
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, source string, text string")


def test_exact_dedup_groups(docs):
    rows = {r["survivor_id"]: r["dup_count"] for r in exact_dedup_groups(docs).collect()}
    assert rows[1] == 2  # 1 and 2
    assert rows[5] == 2  # 5 and 6
    assert rows[3] == 1 and rows[4] == 1 and rows[7] == 1
    # survivor is always the minimum id of its group
    assert 2 not in rows and 6 not in rows


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([("short doc",), ("a b c d",)], "text string")
    rows = df.select(shingles_col(F.col("text"), 3).alias("s")).collect()
    assert rows[0]["s"] == ["short doc"]
    assert rows[1]["s"] == ["a b c", "b c d"]


def test_ngram_jaccard_pairs(docs):
    pairs = {
        (r["id_a"], r["id_b"]): (r["inter_cnt"], r["union_cnt"])
        for r in ngram_jaccard_pairs(docs, threshold_pct=50).collect()
    }
    assert (1, 2) in pairs  # exact dup: intersection == union
    i, u = pairs[(1, 2)]
    assert i == u
    assert (5, 6) in pairs
    assert (3, 4) not in pairs  # unrelated docs
    # near-dup 1↔3: 7 shared trigrams, 1 extra in doc 3
    assert (1, 3) in pairs and (2, 3) in pairs


def test_jaccard_blocks_bound_pairs(docs):
    # docs 1 (source a) and 5 (source b) never form a pair even if identical
    same_text = docs.withColumn("text", F.lit("x y z w"))
    pairs = ngram_jaccard_pairs(same_text, threshold_pct=50).collect()
    assert all(
        (a < 5 and b < 5) or (a >= 5 and b >= 5) for a, b in [(r["id_a"], r["id_b"]) for r in pairs]
    )


def test_minhash_lsh_finds_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, num_perm=12, bands=4, threshold_pct=50).collect()
    }
    # identical docs share every band → always candidates → verified
    assert (1, 2) in pairs
    assert (5, 6) in pairs
    # verification kills false candidates: every reported pair really has
    # jaccard ≥ 50% (cross-checked against the exact operator, unblocked)
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            docs.withColumn("source", F.lit("all")), threshold_pct=50
        ).collect()
    }
    assert pairs <= exact


def test_simhash_identical_and_distance(docs):
    hashed = with_simhash(docs).collect()
    by_id = {r["doc_id"]: tuple(r[f"simhash_{w}"] for w in range(4)) for r in hashed}
    assert by_id[1] == by_id[2]  # identical text → identical simhash
    for w in range(4):
        assert 0 <= by_id[1][w] < 2**16
    pairs = {r["id_a"]: r for r in []}
    res = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_pairs(docs, max_hamming=64).collect()}
    assert res[(1, 2)] == 0
    assert res[(5, 6)] == 0
    assert res[(1, 3)] <= res[(1, 4)]  # near-dup closer than unrelated


def test_simhash_pairs_threshold(docs):
    res = simhash_pairs(docs, max_hamming=0).collect()
    got = {(r["id_a"], r["id_b"]) for r in res}
    assert got == {(1, 2), (5, 6)}


def test_simhash_word_rotation_full_recall(spark):
    """block_col=None: 4-table word rotation must find EVERY pair with
    hamming <= 3 (pigeonhole: <=3 differing bits leave >=1 word identical) —
    compare against the brute-force all-pairs result."""
    from crawlee_spark.operators.dedup import simhash_pairs, with_simhash
    from pyspark.sql import functions as F

    rows = [(i, "blk", f"alpha beta gamma delta epsilon zeta token{i % 7} extra{i % 3}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    rot = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(df, block_col=None, max_hamming=3).collect()
    }
    brute = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(df, block_col="source", max_hamming=3).collect()
    }
    assert rot == brute  # identical pair set + distances, no block needed


def test_simhash_rotation_rejects_large_k(spark):
    from crawlee_spark.operators.dedup import simhash_pairs

    df = spark.createDataFrame([(1, "a", "x")], "doc_id long, source string, text string")
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_pairs(df, block_col=None, max_hamming=4)


def test_repeated_span_stats(spark):
    """Passage-level exact duplication: spans shared across documents are
    found; within-document repetition alone does not satisfy min_docs."""
    from crawlee_spark.operators.dedup import repeated_span_stats

    shared = "the quick brown fox jumps over the lazy dog"  # 9 tokens -> 2 spans
    df = spark.createDataFrame(
        [
            (1, f"intro {shared} and more words follow here"),
            (2, f"other lead-in text {shared} trailing content"),
            (3, "totally different words with no shared passages at all today"),
            # doc 4 repeats a span INTERNALLY twice but shares it with nobody
            (4, "aa bb cc dd ee ff gg hh zz aa bb cc dd ee ff gg hh"),
        ],
        "doc_id long, text string",
    )
    rows = repeated_span_stats(df, window=8, min_docs=2).collect()
    assert len(rows) == 2  # the two 8-token windows of the shared passage
    for r in rows:
        assert r["n_docs"] == 2 and r["n_occurrences"] == 2 and r["first_doc_id"] == 1
    # min_docs=1 additionally surfaces doc 4's internal repetition
    solo = repeated_span_stats(df, window=8, min_docs=1)
    internal = solo.filter("first_doc_id = 4 and n_occurrences >= 2").collect()
    assert any(r["n_docs"] == 1 for r in internal)


def test_repeated_span_sampling_is_exact_subset(spark):
    """sample_every keeps a deterministic 1/N band of span IDENTITIES: the
    sampled result is a subset of the full result with IDENTICAL stats for
    every surviving span (occurrences are never partially dropped)."""
    from crawlee_spark.operators.dedup import repeated_span_stats

    docs = [
        (i, f"w{i} " + " ".join(f"t{j}" for j in range(12)) + f" tail{i % 3} common ending words here now")
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    full = {r["span_hash"]: r for r in repeated_span_stats(df, window=6, min_docs=2).collect()}
    sampled = {
        r["span_hash"]: r
        for r in repeated_span_stats(df, window=6, min_docs=2, sample_every=3).collect()
    }
    assert 0 < len(sampled) < len(full)
    for h, r in sampled.items():
        f = full[h]
        assert (r["n_docs"], r["n_occurrences"], r["first_doc_id"]) == (
            f["n_docs"], f["n_occurrences"], f["first_doc_id"],
        )


def test_benchmark_contamination(spark):
    """Decontamination: docs sharing an 8-token span with a benchmark item
    are flagged with exact span/bench counts; clean docs are absent. The
    corpus-span side must join the benchmark map-side (broadcast) — corpus
    spans never shuffle before the join."""
    from crawlee_spark.operators.dedup import benchmark_contamination
    from tests.test_plans import explain_str

    leak = "the capital of france is paris which is in europe"  # 10 tokens
    docs = spark.createDataFrame(
        [
            (1, f"lead-in words {leak} trailing text"),
            (2, "completely clean document with nothing shared from benchmarks"),
            (3, f"another page quoting {leak} verbatim"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, leak)], "bench_id long, text string")
    out = benchmark_contamination(docs, bench, window=8)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 3}
    for r in rows.values():
        # 10-token leak -> 3 shared 8-token spans, one benchmark item
        assert r["contaminated_spans"] == 3 and r["bench_docs_hit"] == 1
    plan = explain_str(out, "simple")
    assert "BroadcastHashJoin" in plan


def test_dup_clusters_transitive_survivors(spark):
    """Pairs A~B, B~C form ONE cluster with survivor min(id); disjoint
    pairs stay separate; convergence handles a chain longer than one hop."""
    from crawlee_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (5, 20)],
        "id_a long, id_b long",
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,          # 4-node chain collapses to min=1
        10: 10, 11: 10,                   # disjoint pair
        5: 5, 20: 5, 21: 5, 22: 5,       # bridge edge merges the 20s into 5
    }


def test_dup_clusters_refuses_truncated_propagation(spark):
    """ADVICE r4: an iteration budget smaller than the component diameter
    must RAISE, never return intermediate labels as if they were a complete
    clustering (a silent cap would diverge from true connected components
    and from the recursive-CTE oracle)."""
    from crawlee_spark.operators.dedup import dup_clusters

    # a 7-node path graph needs ~log-diameter rounds of min-label hops;
    # with max_iterations=1 the far end cannot have converged
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 7)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dup_clusters(pairs, max_iterations=1)
    # the same graph under the default budget converges to one cluster
    got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()}
    assert got == {i: 1 for i in range(1, 8)}


def test_incremental_lsh_matches_twin_not_stranger(spark):
    """A new batch matched against a persisted index: a lightly mutated twin
    of an indexed doc is found by signature agreement; an unrelated doc is
    not; corpus text is never re-read (the index carries signatures)."""
    from crawlee_spark.operators.dedup import build_lsh_index, incremental_lsh_matches

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "pelicans deliver newspapers to sleepy village porches every morning"
    )
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different text about submarine cables and ocean floors spanning continents")],
        "doc_id long, text string",
    )
    index = build_lsh_index(corpus)
    new = spark.createDataFrame(
        [(100, base + " indeed"), (200, "unrelated quarterly report on alpine goat cheese production volumes")],
        "doc_id long, text string",
    )
    got = {(r["new_id"], r["old_id"]): r["agree_cnt"]
           for r in incremental_lsh_matches(new, index, min_agree=6).collect()}
    assert (100, 1) in got and got[(100, 1)] >= 6
    assert all(nid != 200 for nid, _ in got)
    assert all(oid != 2 for _, oid in got)


def test_build_lsh_index_drops_hot_buckets_at_build(spark):
    """Boilerplate guard lives in the INDEX build: a bucket with more
    members than max_bucket is dropped once, so incremental batches never
    pay for it (and can't match into it)."""
    from crawlee_spark.operators.dedup import build_lsh_index, incremental_lsh_matches

    boiler = "all rights reserved copyright example corp terms of service apply"
    corpus = spark.createDataFrame(
        [(i, boiler) for i in range(5)], "doc_id long, text string"
    )
    assert build_lsh_index(corpus, max_bucket=3).count() == 0
    new = spark.createDataFrame([(100, boiler)], "doc_id long, text string")
    assert (
        incremental_lsh_matches(new, build_lsh_index(corpus, max_bucket=3)).count()
        == 0
    )
