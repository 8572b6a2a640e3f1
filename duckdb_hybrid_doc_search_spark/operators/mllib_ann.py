"""MLlib-backed approximate similarity (north-star: "DataFrame ops + MLlib
for embedding/indexing").

These wrap Spark MLlib's LSH estimators as alternative scale paths next to
the engine's own md5-based LSH (operators/dedup.py) and IVF
(operators/knn.py). MLlib hash families are seeded-random, so results are
deterministic per seed but NOT reproducible in DuckDB SQL — these register
rows-only; tests measure RECALL against the exact oracle-gated operators
instead (approximation quality is a measured number, not a hidden one —
SURVEY.md §4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEED = 42


def _token_vectors(docs: DataFrame, num_features: int = 1 << 18) -> DataFrame:
    """Binary HashingTF vectors over distinct tokens (MinHash needs sets)."""
    from pyspark.ml.feature import HashingTF

    from ..functions.text import tokenize

    toks = docs.select(
        "doc_id", F.array_distinct(tokenize(F.col("text"))).alias("toks")
    ).where(F.size("toks") > 0)
    htf = HashingTF(
        inputCol="toks", outputCol="features", numFeatures=num_features,
        binary=True,
    )
    return htf.transform(toks).select("doc_id", "features")


def mllib_minhash_pairs(docs: DataFrame, jaccard_distance: float = 0.5,
                        num_tables: int = 8) -> DataFrame:
    """Near-dup candidate pairs via MLlib MinHashLSH approxSimilarityJoin.

    Output: doc_a, doc_b, jaccard_dist (1 - Jaccard over hashed token sets;
    note HashingTF collisions make this an approximation of true token-set
    Jaccard even before LSH)."""
    from pyspark.ml.feature import MinHashLSH

    vecs = _token_vectors(docs)
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_tables,
        seed=SEED,
    ).fit(vecs)
    pairs = mh.approxSimilarityJoin(
        vecs, vecs, jaccard_distance, distCol="jaccard_dist"
    )
    return (
        pairs.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
    )


def mllib_brp_neighbors(embeddings: DataFrame, query_vec: list[float],
                        k: int, bucket_length: float = 2.0,
                        num_tables: int = 4) -> DataFrame:
    """Top-k neighbors via BucketedRandomProjectionLSH (euclidean). On
    unit-normalized vectors, euclidean ordering == cosine ordering, so
    recall is measured directly against the exact cosine operator."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.linalg import Vectors

    from ..functions.vector import norm

    normed = embeddings.select(
        F.col("vec_id").alias("doc_id"),
        array_to_vector(
            F.transform(
                "embedding",
                lambda x: x.cast("double") / norm(F.col("embedding")),
            )
        ).alias("features"),
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=bucket_length, numHashTables=num_tables, seed=SEED,
    ).fit(normed)
    import numpy as np

    q = np.asarray(query_vec, dtype="float64")
    q = Vectors.dense(q / np.linalg.norm(q))
    return brp.approxNearestNeighbors(normed, q, k).select(
        "doc_id", F.round("distCol", 6).alias("euclidean_dist")
    )


def mllib_tfidf_top_terms(docs: DataFrame, top_n: int = 50) -> DataFrame:
    """Corpus tf-idf analytics via CountVectorizer + IDF, mapped back to
    the vocabulary: top-N terms by summed tf-idf weight."""
    from pyspark.ml.feature import IDF, CountVectorizer

    from ..functions.text import tokenize

    toks = docs.select("doc_id", tokenize(F.col("text")).alias("toks"))
    vocab_size = 1 << 16
    cv = CountVectorizer(
        inputCol="toks", outputCol="tf", vocabSize=vocab_size, minDF=1.0
    ).fit(toks)
    # the closed-form oracle assumes an UNTRUNCATED vocabulary; silent
    # truncation would drop terms only on the Spark side — fail loudly
    if len(cv.vocabulary) >= vocab_size:
        raise ValueError(
            f"corpus vocabulary hit vocabSize={vocab_size}; raise it "
            "(tfidf oracle requires the untruncated vocabulary)"
        )
    tf = cv.transform(toks)
    idf = IDF(inputCol="tf", outputCol="tfidf").fit(tf)
    weighted = idf.transform(tf)

    from pyspark.ml.functions import vector_to_array

    arr = weighted.select(vector_to_array("tfidf").alias("w"))
    summed = arr.select(
        F.posexplode("w").alias("idx", "weight")
    ).groupBy("idx").agg(F.sum("weight").alias("total"))
    vocab = [(i, t) for i, t in enumerate(cv.vocabulary)]
    vocab_df = docs.sparkSession.createDataFrame(vocab, "idx int, term string")
    return (
        summed.join(F.broadcast(vocab_df), "idx")
        .select("term", F.round("total", 6).alias("tfidf_sum"))
        .orderBy(F.desc("tfidf_sum"), F.asc("term"))
        .limit(top_n)
    )
