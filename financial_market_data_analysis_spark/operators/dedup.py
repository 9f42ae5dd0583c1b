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


def shingle_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The (id, shingle) long table — one row per distinct shingle per
    document. ``_shingles`` is already per-doc distinct, so no global
    ``.distinct()`` shuffle is needed."""
    return df.select(
        F.col(id_col), F.explode(_shingles(text_col)).alias("shingle")
    )


def shingle_arrays(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, sh_arr) — the per-doc distinct-shingle ARRAY, row-local.

    Keeping shingles as an array column (instead of exploding) lets the
    whole MinHash signature/band computation stay row-local: zero
    shuffles until the band self-join. Docs with no shingles (fewer
    than n tokens) are dropped, matching the explode-based semantics
    where they simply produce no rows.
    """
    return df.select(F.col(id_col), _shingles(text_col).alias("sh_arr")).filter(
        F.size("sh_arr") > 0
    )


def _minhash_expr(sh_arr: Column, seed: int) -> Column:
    """min over the doc's shingles of ``md5(seed:shingle)`` — a
    row-local array fold (lexicographic min of hex strings, identical
    to SQL ``min()`` over the exploded rows)."""
    return F.array_min(
        F.transform(
            sh_arr,
            lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s).cast("binary")),
        )
    )


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n_hashes: int = N_MINHASH,
    shingle_arr: DataFrame | None = None,
) -> DataFrame:
    """(id, seed, minhash) — computed ROW-LOCALLY from the shingle
    array: no explode of (doc × shingle × seed) rows, no groupBy. The
    k-fold md5 work is inherent to MinHash; the shuffles the naive
    explode+re-aggregate plan pays are not. Output is identical to the
    exploded formulation (the DuckDB oracle keeps that shape).
    """
    src = shingle_arr if shingle_arr is not None else shingle_arrays(df, id_col, text_col)
    mhs = F.array(*[_minhash_expr(F.col("sh_arr"), p) for p in range(n_hashes)])
    return src.select(F.col(id_col), F.posexplode(mhs).alias("seed", "mh"))


def lsh_bands(
    src: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = N_MINHASH,
    band_size: int = BAND_SIZE,
) -> DataFrame:
    """(id, band, band_hash) — row-local banding over the shingle-array
    table: band hash = md5 of the band's minhashes in seed order,
    exactly the hash the grouped formulation produces."""
    structs = []
    for b in range(n_hashes // band_size):
        seeds = range(b * band_size, (b + 1) * band_size)
        bh = F.md5(
            F.concat_ws(
                ",", *[_minhash_expr(F.col("sh_arr"), p) for p in seeds]
            ).cast("binary")
        )
        structs.append(F.struct(F.lit(b).alias("band"), bh.alias("band_hash")))
    return src.select(
        F.col(id_col), F.explode(F.array(*structs)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash"))


def band_candidate_pairs(bands: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Self-join band buckets → de-duplicated ordered candidate pairs.
    Equi-join on (band, band_hash): Spark hash-partitions buckets
    across executors — never an all-pairs comparison."""
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


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str = "doc_id", band_size: int = BAND_SIZE
) -> DataFrame:
    """Candidate pairs from (id, seed, mh) signature rows — the grouped
    formulation, kept for callers that materialize signatures. The
    fused pipeline (``minhash_lsh_dedup``) uses the row-local
    ``lsh_bands`` instead."""
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
    return band_candidate_pairs(bands, id_col)


def jaccard_verify(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact token-shingle Jaccard for candidate pairs only.

    |A∩B| via an equi-join of the two shingle sets on the shingle value;
    |A|,|B| precomputed per document — no full cross-product anywhere.
    Pass a precomputed (id, shingle) table to avoid re-deriving
    shingles when an upstream stage already built them.
    """
    sh = shingles if shingles is not None else shingle_table(df, id_col, text_col)
    sh = sh.persist()
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
    pairs → exact-Jaccard verify → threshold filter.

    Fused scale shape: the per-doc shingle ARRAY is computed once and
    persisted (one corpus scan); minhashing and banding are row-local
    folds over it (zero shuffles before the band self-join); Jaccard
    verification explodes the same persisted arrays. The naive plan —
    explode → distinct → groupBy per stage — pays 4+ wide shuffles of
    the (doc × shingle × seed) blow-up; this pays one band join and one
    shingle equi-join.
    """
    shingled = shingle_arrays(df, id_col, text_col).persist()
    bands = lsh_bands(shingled, id_col)
    pairs = band_candidate_pairs(bands, id_col)
    sh = shingled.select(F.col(id_col), F.explode("sh_arr").alias("shingle"))
    verified = jaccard_verify(pairs, df, id_col, text_col, shingles=sh)
    return verified.filter(F.col("jaccard") >= threshold)


def embedding_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    threshold: float = 0.95,
    method: str = "gaussian",
) -> DataFrame:
    """Embedding near-dup: random-hyperplane LSH bucket → within-bucket
    exact cosine → threshold.

    ``method="gaussian"`` (default) uses the seeded-Gaussian plane
    matrix inlined as codegen literals — the production path;
    ``"md5"`` keeps the hex-parity ±1 planes (engine-portable hashes).
    Either way the bucket is an n-bit sign pattern and only same-bucket
    pairs pay the exact-cosine cost — an equi-join on the bucket key.
    """
    from financial_market_data_analysis_spark.operators.similarity import (
        bucket_expr,
        cosine_expr,
    )

    b = emb.select(
        F.col(id_col), F.col(vec_col), bucket_expr(vec_col, n_planes, method).alias("bucket")
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
