"""Similarity search over embedding columns (array<float>).

- ``cosine`` / ``dot``: explicit fold expressions (zip_with +
  aggregate) in double precision — deterministic left-to-right
  summation, reproducible across engines.
- ``brute_force_topk``: exact top-k neighbors for a set of query
  vectors — broadcast the (small) query side, one pass over the
  corpus, per-query top-k via window rank. At 100 TB this is the
  map-only scan baseline: no corpus shuffle, only (q × k) rows after
  the rank filter.
- ``lsh_topk``: the scale path — random-hyperplane (sign) LSH buckets
  both sides so each query only scores its bucket's candidates;
  recall < 1.0, cost ~ bucket occupancy instead of the full corpus.
  Hyperplanes are derived deterministically from md5 so results are
  reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hstream_spark.operators.text import P31


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ — sequential fold, deterministic."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_to_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (excluding itself). Ties broken by corpus id ascending."""
    q = F.broadcast(
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    )
    c = corpus.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cos", "rank")
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 bytes."""
    import hashlib

    vals = []
    i = 0
    while len(vals) < dim:
        digest = hashlib.md5(f"hsplane-{plane}-{i}".encode()).digest()
        for off in range(0, 16, 2):
            raw = int.from_bytes(digest[off : off + 2], "big")
            vals.append((raw / 32767.5) - 1.0)  # [-1, 1)
            if len(vals) == dim:
                break
        i += 1
    return vals


def sign_lsh_bucket(vec: Column, dim: int, planes: int = 8) -> Column:
    """Random-hyperplane LSH bucket id: bit p = sign(vec · plane_p)."""
    bucket = F.lit(0)
    for p in range(planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, p)])
        d = dot(vec, plane)
        bucket = bucket + F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: both sides bucketed by sign-LSH, then
    exact scoring within the bucket. One equi-join shuffle on the
    bucket key instead of a cross join."""
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        sign_lsh_bucket(F.col(vec_col), dim, planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        sign_lsh_bucket(F.col(vec_col), dim, planes).alias("bucket"),
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cos", "rank")
    )
