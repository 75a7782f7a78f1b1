"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline — a broadcast of the query
  set against the corpus, dot products via zip_with/aggregate (JVM-side,
  codegen); cost O(|Q| * N), the right tool when |Q| is small;
- LSH-bucketed ANN: random-hyperplane signatures partition the corpus;
  queries probe only their bucket — the 100TB path (bucket join instead of
  cross join). Hyperplanes are seeded-deterministic literals.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from codeontologypython_spark.operators.relational import top1_per_group


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                round_digits: int = 4) -> DataFrame:
    """Exact top-k neighbors per query (excluding self). Rounded cosine keeps
    the ranking engine-portable (float-sum ulp differences vs SQL oracles);
    ties break on neighbor id."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cv"))
    scored = (q.crossJoin(c)
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cos", F.round(
                  cosine(F.col("qv").cast("array<double>"),
                         F.col("cv").cast("array<double>")), round_digits)))
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cos", "rank"))


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit j = sign(v . h_j); returned as a
    compact integer bucket key."""
    out = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bit = (dot(vec.cast("array<double>"), p) > 0).cast("long")
        out = out + F.shiftleft(bit, j)
    return out


def lsh_ann_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 dim: int = 16, n_planes: int = 6, seed: int = 42,
                 round_digits: int = 4) -> DataFrame:
    """Approximate top-k: sign-LSH bucket join, exact cosine within bucket.
    At scale the corpus is written bucketed by signature so the probe is a
    co-located join; recall is traded via n_planes (fewer planes -> bigger
    buckets -> higher recall)."""
    planes = _hyperplanes(dim, n_planes, seed)
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cv"),
                      lsh_signature(F.col(vec_col), planes).alias("bucket"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"),
                       lsh_signature(F.col(vec_col), planes).alias("bucket"))
    scored = (q.join(c, "bucket")
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cos", F.round(
                  cosine(F.col("qv").cast("array<double>"),
                         F.col("cv").cast("array<double>")), round_digits)))
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cos", "rank"))


def embedding_near_dup_pairs(corpus: DataFrame, threshold: float = 0.98,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             dim: int = 16, n_planes: int = 4,
                             seed: int = 7) -> DataFrame:
    """Embedding-cosine near-duplicate detection: LSH bucket self-join +
    exact cosine filter."""
    planes = _hyperplanes(dim, n_planes, seed)
    t = corpus.select(F.col(id_col).alias("doc"), F.col(vec_col).alias("v"),
                      lsh_signature(F.col(vec_col), planes).alias("bucket"))
    a = t.select(F.col("doc").alias("doc_a"), F.col("v").alias("va"), "bucket")
    b = t.select(F.col("doc").alias("doc_b"), F.col("v").alias("vb"), "bucket")
    return (a.join(b, "bucket")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .withColumn("cos", cosine(F.col("va").cast("array<double>"),
                                      F.col("vb").cast("array<double>")))
            .filter(F.col("cos") >= threshold)
            .select("doc_a", "doc_b", F.round("cos", 4).alias("cos")))
