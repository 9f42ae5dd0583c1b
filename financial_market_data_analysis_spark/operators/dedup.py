"""Deduplication operators for large-scale corpora: exact, MinHash+LSH,
n-gram Jaccard, and embedding-cosine near-dup.

Scale design notes (the whole point of these implementations):

- **Exact** dedup is a hash-groupBy on a digest of the dedup key — one
  shuffle of (digest, id), never of the payload.
- **MinHash+LSH** is the classic shingle → k minhashes → b bands →
  bucket-join pipeline. Everything before the band join is row-local or
  partial-aggregatable; the candidate-pair join is an equi-join on
  (band, band_hash), so Spark hash-partitions buckets across executors.
  Candidates are then verified with exact Jaccard — only candidate
  pairs pay the set-intersection cost.
- Hashes are md5-based (not xxhash/murmur) deliberately: md5 is
  bit-identical across engines, which makes the whole pipeline
  oracle-testable in ANSI SQL. At production scale you'd swap in
  xxhash64 for speed — the topology is identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from financial_market_data_analysis_spark.functions.core import safe_div
from financial_market_data_analysis_spark.functions.text import tokens, tokens_sql

N_MINHASH = 8  # k signature rows
BAND_SIZE = 2  # rows per band → b = 4 bands
SHINGLE = 3  # token-level n-gram shingles


def exact_dedup(
    df: DataFrame, key_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: digest-groupBy keeping the smallest id as canonical.

    Output: one row per distinct key value — (fp, keeper id, copy count).
    """
    return (
        df.select(F.md5(F.col(key_col).cast("binary")).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def _shingles(text_col: str = "text", n: int = SHINGLE) -> Column:
    """Distinct token n-gram shingles as strings ('tok1 tok2 tok3').

    1-based ``element_at`` indexing mirrors SQL list indexing exactly.
    Documents with fewer than n tokens yield an empty shingle set.
    """
    toks = tokens(text_col)
    cnt = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), cnt),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )
    # sequence(1, k) with k < 1 counts DOWN in Spark — guard short docs
    # to an empty shingle set (matching SQL generate_series semantics).
    return F.when(cnt >= 1, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n_hashes: int = N_MINHASH,
) -> DataFrame:
    """(id, seed, minhash) — min over shingles of ``md5(seed:shingle)``.

    Exploding shingles then re-aggregating min() is partial-aggregatable
    (map-side combine), so the shuffle carries ≤ k rows per document.
    """
    sh = (
        df.select(F.col(id_col), F.explode(_shingles(text_col)).alias("shingle"))
        .distinct()
    )
    seeds = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("seed")
    return (
        sh.select(id_col, seeds, "shingle")
        .select(
            id_col,
            "seed",
            F.md5(
                F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("shingle")).cast(
                    "binary"
                )
            ).alias("h"),
        )
        .groupBy(id_col, "seed")
        .agg(F.min("h").alias("mh"))
    )


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str = "doc_id", band_size: int = BAND_SIZE
) -> DataFrame:
    """Band the signature rows and self-join buckets → candidate pairs.

    Band hash = md5 of the band's minhashes in seed order. The self-join
    is an equi-join on (band, band_hash); output pairs are de-duplicated
    and ordered (a < b).
    """
    bands = (
        sigs.withColumn("band", (F.col("seed") / band_size).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("seed", "mh"))),
                        lambda x: x["mh"],
                    ),
                ).cast("binary")
            ).alias("band_hash")
        )
    )
    a = bands.select(
        F.col(id_col).alias("doc_a"), F.col("band"), F.col("band_hash")
    )
    b = bands.select(
        F.col(id_col).alias("doc_b"), F.col("band"), F.col("band_hash")
    )
    return (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact token-shingle Jaccard for candidate pairs only.

    |A∩B| via an equi-join of the two shingle sets on the shingle value;
    |A|,|B| precomputed per document — no full cross-product anywhere.
    """
    sh = df.select(
        F.col(id_col), F.explode(_shingles(text_col)).alias("shingle")
    ).distinct()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))

    inter = (
        pairs.join(
            sh.select(F.col(id_col).alias("doc_a"), F.col("shingle")), "doc_a"
        )
        .join(
            sh.select(F.col(id_col).alias("doc_b"), F.col("shingle")),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .na.fill({"n_inter": 0})
        .join(sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b")), "doc_b")
        .withColumn(
            "jaccard",
            safe_div(
                F.col("n_inter").cast("double"),
                (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
            ),
        )
    )
    return out.select("doc_a", "doc_b", "n_inter", "n_a", "n_b", "jaccard")


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → LSH bands → candidate
    pairs → exact-Jaccard verify → threshold filter."""
    sigs = minhash_signatures(df, id_col, text_col)
    pairs = lsh_candidate_pairs(sigs, id_col)
    verified = jaccard_verify(pairs, df, id_col, text_col)
    return verified.filter(F.col("jaccard") >= threshold)


def embedding_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding near-dup: random-hyperplane LSH bucket → within-bucket
    exact cosine → threshold.

    The ±1 hyperplanes are derived from md5 parities (deterministic and
    engine-portable); the bucket is the 8-bit sign pattern. Only
    same-bucket pairs pay the exact-cosine cost — the join is an
    equi-join on the bucket key.
    """
    from financial_market_data_analysis_spark.operators.similarity import (
        cosine_expr,
        hyperplane_bucket,
    )

    b = emb.select(
        F.col(id_col), F.col(vec_col), hyperplane_bucket(vec_col, n_planes).alias("bucket")
    )
    left = b.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"), "bucket"
    )
    right = b.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"), "bucket"
    )
    pairs = left.join(right, "bucket").filter(F.col("id_a") < F.col("id_b"))
    out = pairs.withColumn("cosine", cosine_expr("vec_a", "vec_b"))
    return out.filter(F.col("cosine") >= threshold).select("id_a", "id_b", "cosine")
