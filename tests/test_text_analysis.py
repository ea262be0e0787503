"""Text-analysis kernels: tokens, quality, lang-id, fingerprint."""

import pytest
from pyspark.sql import functions as F

from crawlee_spark.functions import text_analysis as TA

ROWS = [
    (1, "the quick brown fox, it jumps!"),
    (2, ""),
    (3, "der hund und die katze ist nicht da"),
    (4, "one two three"),
    (5, "three two one"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def _one(docs, col, doc_id):
    return docs.filter(F.col("doc_id") == doc_id).select(col.alias("v")).collect()[0]["v"]


def test_token_counts(docs):
    assert _one(docs, TA.token_count_col("text"), 1) == 6
    assert _one(docs, TA.token_count_col("text"), 2) == 0
    # BPE-ish: letter runs + punctuation marks each count
    # the/quick/brown/fox/,/it/jumps/! → 8
    assert _one(docs, TA.bpe_ish_token_count_col("text"), 1) == 8
    assert _one(docs, TA.bpe_ish_token_count_col("text"), 2) == 0


def test_punct_and_stopwords(docs):
    assert _one(docs, TA.punct_count_col("text"), 1) == 2  # , and !
    assert _one(docs, TA.stopword_count_col("text"), 1) == 2  # 'the' and 'it'
    assert _one(docs, TA.stopword_count_col("text"), 2) == 0


def test_quality_score_bounds(docs):
    vals = [r["v"] for r in docs.select(TA.quality_score_col("text").alias("v")).collect()]
    assert all(0 <= v <= 100 for v in vals)
    # empty doc scores 0
    assert _one(docs, TA.quality_score_col("text"), 2) == 0


def test_lang_id(docs):
    assert _one(docs, TA.lang_id_col("text"), 1) == "en"
    assert _one(docs, TA.lang_id_col("text"), 3) == "de"
    assert _one(docs, TA.lang_id_col("text"), 2) == "und"
    assert _one(docs, TA.lang_id_col("text"), 4) == "und"


def test_fingerprint_order_sensitive(docs):
    f4 = _one(docs, TA.doc_fingerprint_col("text"), 4)
    f5 = _one(docs, TA.doc_fingerprint_col("text"), 5)
    assert f4 != f5  # same tokens, different order
    assert 0 <= f4 < 2147483647
    assert _one(docs, TA.doc_fingerprint_col("text"), 2) == 0


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame([(1, "a  b   c"), (2, "a b c")], "doc_id long, text string")
    vals = [r["v"] for r in df.select(TA.doc_fingerprint_col("text").alias("v")).collect()]
    assert vals[0] == vals[1]
