"""Similarity search over an embedding column (array<float64>).

Brute-force cosine top-K as the exact baseline; deterministic random-
hyperplane LSH bucketing as the scale path (candidates shrink from N to
one bucket; at 10^12 rows you'd multi-probe neighboring buckets and
partition the index by bucket prefix). All math is dual-dialect exact
(functions/text.py LCG hyperplanes), so both paths have DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_muse_spark.functions import text as X

__all__ = ["cosine_topk", "lsh_buckets", "ann_lsh_topk", "embedding_near_dups"]


def _cosine(a: str, b: str, dims: int) -> F.Column:
    dot = X.dot_product("spark", a, b, dims)
    na = X.dot_product("spark", a, a, dims)
    nb = X.dot_product("spark", b, b, dims)
    return F.expr(f"({dot}) / (sqrt({na}) * sqrt({nb}))")


def cosine_topk(
    emb: DataFrame, query_vec_id: int = 0, k: int = 20, dims: int = 64
) -> DataFrame:
    """Exact brute-force cosine top-K vs one stored vector. The 1-row
    query side is broadcast; at cluster scale this is a map-only scan +
    TakeOrderedAndProject."""
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb")
    )
    scored = (
        emb.filter(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(q))
        .select(
            "vec_id",
            F.round(_cosine("embedding", "q_emb", dims), 6).alias("cosine"),
        )
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(k)


def lsh_buckets(
    emb: DataFrame, planes: int = 16, dims: int = 64
) -> DataFrame:
    """Deterministic hyperplane LSH bucket per vector (JVM expression)."""
    return emb.select(
        "vec_id",
        "embedding",
        F.expr(X.hyperplane_bucket("spark", "embedding", planes, dims)).alias(
            "bucket"
        ),
    )


def ann_lsh_topk(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    planes: int = 8,
    dims: int = 64,
    multi_probe: bool = False,
) -> DataFrame:
    """Approximate NN: cosine top-K restricted to the query's LSH bucket.

    planes=8 => 256 buckets; the candidate set is ~N/256 of the table.
    Recall/cost trades with `planes`; multi_probe=True also scans the
    `planes` buckets at hamming distance 1 from the query's (each sign
    bit flipped once) — the standard recall boost for vectors near a
    hyperplane, at (planes+1)/1 probe cost. The probe set is tiny and
    broadcast, so the scan stays map-only at any table size.
    """
    b = lsh_buckets(emb, planes, dims)
    q = b.filter(F.col("vec_id") == query_vec_id).select(
        F.col("bucket").alias("q_bucket"), F.col("embedding").alias("q_emb")
    )
    if multi_probe:
        probes = F.array(
            F.col("q_bucket"),
            *[
                F.col("q_bucket").bitwiseXOR(F.lit(1 << i))
                for i in range(planes)
            ],
        )
        cond = F.array_contains(probes, F.col("bucket"))
    else:
        cond = F.col("bucket") == F.col("q_bucket")
    cands = (
        b.filter(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(q), cond)
        .select(
            "vec_id",
            F.round(_cosine("embedding", "q_emb", dims), 6).alias("cosine"),
        )
    )
    return cands.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(k)


def embedding_near_dups(
    emb: DataFrame, threshold: float = 0.3, planes: int = 4, dims: int = 64
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucket blocked.

    Pairs sharing a hyperplane bucket are scored exactly (JVM fold, no
    Python); `planes` trades recall vs join fan-out — the self-join is
    an equi-join on bucket, so at 10^12 rows it shuffles each bucket to
    one place instead of the quadratic cross join. Multi-probe (hamming-1
    neighbor buckets) is the documented recall extension.
    """
    b = lsh_buckets(emb, planes, dims)
    left = b.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        "bucket",
    )
    right = b.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        "bucket",
    )
    pairs = left.join(right, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
    scored = pairs.select(
        "vec_a",
        "vec_b",
        F.round(_cosine("emb_a", "emb_b", dims), 6).alias("cosine"),
    )
    return scored.filter(F.col("cosine") >= threshold)
