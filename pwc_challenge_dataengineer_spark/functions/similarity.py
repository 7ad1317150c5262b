"""Similarity search over embedding columns (array<float>).

BASELINE.json north-star operator set. Two paths:

- brute-force cosine top-k: cross join queries × corpus, dot product via
  ``zip_with`` + ``aggregate`` (sequential left fold → deterministic double
  accumulation, JVM-side, no UDF). Fine for small query sets; cost is
  |Q|·|corpus|.
- LSH-bucketed ANN (random hyperplanes): deterministic pseudo-random
  hyperplane signs derived from md5(plane:dim), signature = sign-bit string,
  candidates restricted to the query's bucket. The 100 TB path: buckets
  shard the corpus so each query probes |corpus| / 2^planes rows.

An IVF variant (k-means coarse quantizer via pyspark.ml) is sketched in
plans/similarity.py docstrings; LSH is the default because it needs no
training pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic accumulation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk_brute(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Ranking key is (round(cos,6) DESC, id) so ordering is stable across
    engines; the rounded similarity is also the emitted value.
    """
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(F.col(vec_col)).alias("cv")
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_signs(n_planes: int, dims: int) -> list[list[int]]:
    """Deterministic ±1 hyperplane components from md5 parity — no RNG state,
    reproducible on any engine/driver."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dims):
            h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
            row.append(1 if int(h[0], 16) < 8 else -1)
        planes.append(row)
    return planes


def lsh_bucket(vec_col: Column, planes: list[list[int]]) -> Column:
    """Bucket id = bits of sign(plane · vec)."""
    bucket = F.lit(0).cast("bigint")
    for p, signs in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                as_double_array(vec_col),
                F.array(*[F.lit(float(s)) for s in signs]),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.shiftleft(F.lit(1).cast("bigint"), p)).otherwise(0)
    return bucket


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 6,
    dims: int = 64,
) -> DataFrame:
    """Approximate top-k: only candidates in the query's hyperplane bucket.

    Join is an equi-join on bucket — at scale each probe touches
    ~|corpus|/2^n_planes rows instead of the full corpus.
    """
    from pyspark.sql.window import Window

    planes = hyperplane_signs(n_planes, dims)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_array(F.col(vec_col)).alias("qv"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(F.col(vec_col)).alias("cv"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            "bucket",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
