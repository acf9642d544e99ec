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

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hstream_spark.operators.dedup import ceil_div
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


def normalized(vec: Column) -> Column:
    """vec / ‖vec‖ in two array traversals, norm computed ONCE.

    Uses the 4-arg ``aggregate`` finish lambda so the squared-norm is a
    *bound variable* inside the per-element division — higher-order
    functions are interpreted without common-subexpression elimination,
    so a naive ``transform(v, x -> x / norm_expr)`` would re-run the
    whole norm fold for every element (64× the work at dim=64).

    Normalizing once at the scan turns every downstream cosine into a
    single dot fold (pairs × 1 traversal instead of pairs × 4), which
    is the difference between O(pairs·d) and O(4·pairs·d) interpreted
    ops in every similarity join.
    """
    d = _to_double(vec)
    return F.aggregate(
        d,
        F.lit(0.0),
        lambda acc, x: acc + x * x,
        lambda s: F.transform(d, lambda x: x / F.sqrt(s)),
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (excluding itself). Ties broken by corpus id ascending.

    Both sides are L2-normalized at the scan so per-pair scoring is a
    single dot fold."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("q_id"), normalized(F.col(vec_col)).alias("q_vec")
        )
    )
    c = corpus.select(
        F.col(id_col).alias("c_id"), normalized(F.col(vec_col)).alias("c_vec")
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", dot(F.col("q_vec"), F.col("c_vec")).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cos", "rank")
    )


def brute_force_topk_np(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = 8,
    max_queries: int = 100_000,
) -> DataFrame:
    """Vectorized exact cosine top-k: the query matrix is collected
    (queries are the small side by construction) and broadcast into an
    Arrow-batched ``mapInPandas`` stage that scores each corpus batch
    with one BLAS matmul — ~100× the per-element throughput of
    interpreted expression folds.

    Each batch emits only its local top-(k+1) per query (pruned with
    ``argpartition``), so the post-shuffle global rank sees at most
    partitions × queries × (k+1) rows regardless of corpus size — the
    map-side-combine shape of a distributed top-k. Scores are rounded
    to ``digits`` decimals to be reproducible across BLAS summation
    orders.
    """
    import numpy as np
    import pandas as pd

    # the query side is collected + broadcast into every score task, so
    # it must be driver/executor-memory sized; fail loudly (with the fix)
    # instead of OOMing the driver when someone points it at a corpus
    qrows = (
        queries.select(F.col(id_col), F.col(vec_col)).limit(max_queries + 1).collect()
    )
    if len(qrows) > max_queries:
        raise ValueError(
            f"brute_force_topk_np: query side exceeds max_queries={max_queries} "
            "rows; it is collected to the driver and broadcast per task. "
            "Pass a smaller query set (or raise max_queries deliberately), "
            "or use ann_lsh_topk / ann_ivf_topk for corpus-x-corpus search."
        )
    q_ids = np.asarray([r[0] for r in qrows], dtype=np.int64)
    Q = np.asarray([list(r[1]) for r in qrows], dtype=np.float64)
    Qn = Q / np.sqrt((Q * Q).sum(axis=1, keepdims=True))
    kk = k + 1  # keep one spare so dropping a self-pair can't cost a hit

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            C = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            Cn = C / np.sqrt((C * C).sum(axis=1, keepdims=True))
            S = np.round(Cn @ Qn.T, digits)
            frames = []
            for j in range(S.shape[1]):
                col = S[:, j]
                cand = np.nonzero(ids != q_ids[j])[0]
                if cand.size == 0:
                    continue
                if cand.size > kk:
                    cand = cand[np.argpartition(-col[cand], kk - 1)[:kk]]
                order = np.lexsort((ids[cand], -col[cand]))
                cand = cand[order]
                frames.append(
                    pd.DataFrame(
                        {
                            "q_id": np.full(cand.size, q_ids[j]),
                            "c_id": ids[cand],
                            "cos": col[cand],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    scored = corpus.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        score, "q_id long, c_id long, cos double"
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


def sign_lsh_bucket(vec: Column, dim: int, planes: int = 8,
                    first_plane: int = 0) -> Column:
    """Random-hyperplane LSH bucket id: bit p = sign(vec · plane_p).

    ``first_plane`` offsets into the deterministic hyperplane sequence
    so multi-TABLE LSH (L independent plane sets) draws disjoint
    planes per table. All hyperplanes ship as ONE nested-array literal
    and the per-plane dots come from a transform-over-planes fold —
    two Literal nodes total instead of ``planes`` unrolled dot trees
    (plan construction and analysis cost scale with expression size;
    see the F.lit note in the module docstring)."""
    plane_lit = F.lit([
        _hyperplane(dim, first_plane + p) for p in range(planes)
    ])
    powers = F.lit([1 << p for p in range(planes)])
    dots = F.transform(plane_lit, lambda p: dot(vec, p))
    bits = F.zip_with(
        dots, powers, lambda d, pw: F.when(d > 0, pw).otherwise(F.lit(0).cast("long"))
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda a, x: a + x)


def embedding_near_duplicates(
    corpus: DataFrame,
    threshold: float = 0.9,
    dim: int | None = None,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    blocked: bool = True,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cos ≥ threshold).

    ``blocked=True`` (the scale path) buckets both sides with
    sign-LSH and only scores within-bucket pairs — one equi-join
    shuffle keyed on the bucket instead of an O(n²) cross join.
    High-cosine pairs land in the same bucket with probability
    (1 − θ/π)^planes (θ = angle), so recall is tunable via ``planes``.
    ``blocked=False`` is the exact quadratic baseline for small/
    blocked corpora.
    """
    if blocked:
        if dim is None:
            raise ValueError("dim is required for the LSH-blocked path")
        base = corpus.select(
            F.col(id_col).alias("id"),
            normalized(F.col(vec_col)).alias("vec"),
            sign_lsh_bucket(F.col(vec_col), dim, planes).alias("bucket"),
        )
        a = base.select(F.col("bucket"), F.col("id").alias("id_a"), F.col("vec").alias("vec_a"))
        b = base.select(F.col("bucket"), F.col("id").alias("id_b"), F.col("vec").alias("vec_b"))
        pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    else:
        a = corpus.select(F.col(id_col).alias("id_a"), normalized(F.col(vec_col)).alias("vec_a"))
        b = corpus.select(F.col(id_col).alias("id_b"), normalized(F.col(vec_col)).alias("vec_b"))
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a", "id_b", dot(F.col("vec_a"), F.col("vec_b")).alias("cos")
        )
        .filter(F.col("cos") >= threshold)
    )


def embedding_near_duplicates_capped(
    corpus: DataFrame,
    threshold: float = 0.9,
    dim: int | None = None,
    planes: int = 8,
    tables: int = 2,
    cap: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs via MULTI-TABLE sign-LSH with
    hot-bucket capping — the 100 TB shape of
    ``embedding_near_duplicates(blocked=True)``.

    The single-table blocked path holds bucket COUNT fixed (2^planes),
    so occupancy grows linearly with the corpus and within-bucket pairs
    quadratically — the round-10 sf1 sweep measured it 15.5× at 10×
    data. Two changes, both standard LSH practice:

    - ``tables`` independent plane sets (disjoint slices of the
      deterministic hyperplane sequence): a pair is a candidate if it
      co-buckets in ANY table — recall 1−(1−(1−θ/π)^planes)^tables,
      strictly ABOVE the single-table path at equal planes;
    - per (table, bucket) occupancy over ``cap`` splits into salted
      sub-buckets (engine-agnostic md5(id#table) mod n_sub — each
      table re-salts independently, the ``capped_band_candidates``
      scheme): any one bucket's pair contribution drops from O(m²) to
      O(m·cap). Buckets at or under the cap keep salt 0 everywhere, so
      corpora without hot buckets get EXACTLY the uncapped multi-table
      pair set. In a hot bucket a dup pair survives iff some table
      co-salts it — the documented bounded-recall trade, and dup
      CLUSTERS stay connected with overwhelming probability (what
      component-based dedup consumes).

    Exact cosine still verifies every candidate; capping and tabling
    only shape the CANDIDATE set.

    Plan shape (round 13): the per-table bucket folds are columns of
    the SAME persisted frame as the normalized vectors, so the
    8×``tables`` hyperplane dot products run once at materialization —
    each self-join side (and the cosine verify) reads them from cache
    instead of re-running the fold per reference (round 12 left the
    fold recomputing on each side). Occupancy stays a count Window
    whose (tbl, bucket) hash partitioning is a SUBSET of the self-join
    keys (tbl, bucket, salt), and the salted frame is checkpointed, so
    the candidate self-join plans with ZERO further exchanges — the
    window exchange runs once and is the only shuffle before the
    verify joins. (A groupBy-counts + broadcast-join-back variant
    measured SLOWER and erratic at sf0.1: it reintroduces per-side
    join exchanges and its bogus-small post-broadcast size estimate
    can flip the self-join to a full-side broadcast.)
    """
    if dim is None:
        raise ValueError("dim is required for the LSH path")
    from pyspark.sql import Window as _W

    base = (
        corpus.select(
            F.col(id_col).alias("id"), normalized(F.col(vec_col)).alias("vec")
        )
        .select(
            "id",
            "vec",
            F.array(*[
                sign_lsh_bucket(F.col("vec"), dim, planes, first_plane=t * planes)
                for t in range(tables)
            ]).alias("__buckets"),
        )
        .persist()
    )
    tb = base.select("id", F.posexplode("__buckets").alias("tbl", "bucket"))
    bn = F.count(F.lit(1)).over(_W.partitionBy("tbl", "bucket"))
    n_sub = ceil_div(bn, cap)
    salt = F.when(bn <= cap, F.lit(0).cast("long")).otherwise(
        F.conv(
            F.substring(
                F.md5(F.concat_ws("#", F.col("id").cast("string"),
                                  F.col("tbl").cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("long") % n_sub
    )
    salted = tb.select("id", "tbl", "bucket", salt.alias("salt")).localCheckpoint()
    cand = (
        salted.alias("a")
        .join(salted.alias("b"), ["tbl", "bucket", "salt"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    a = base.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"))
    b = base.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b",
                dot(F.col("vec_a"), F.col("vec_b")).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def ivf_centroids(
    corpus: DataFrame,
    n_clusters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic IVF coarse centroids: element-wise mean of the
    vectors in each of ``n_clusters`` seed groups (``id % n_clusters``).

    A hash-partition seeding stands in for k-means iterations so the
    quantizer is reproducible (and expressible in the SQL oracle);
    swapping in ML-trained centroids changes nothing downstream.
    Sums run in 2^-40 binary fixed point so the mean is
    order-independent across engines and partitionings — binary, not
    decimal, because double→DECIMAL casts double-round in some engines
    and can disagree at grid-edge values (see `kmeans_fit`).  The
    rounded per-element longs accumulate as decimal(38,0) (128-bit
    internal sum): int64 accumulation would silently wrap past ~2^23
    rows per (cluster,pos) in non-ANSI Spark, while the decimal sum
    has ~10^25-row headroom at this scale factor — and DuckDB's
    SUM(BIGINT) is HUGEINT (128-bit) already, so cross-engine
    byte-parity is unchanged.
    """
    scale = float(1 << 40)
    e = corpus.select(
        (F.col(id_col) % n_clusters).alias("cluster"),
        F.posexplode(_to_double(F.col(vec_col))).alias("pos", "v"),
    )
    per_dim = e.groupBy("cluster", "pos").agg(
        (
            F.sum(
                F.round(F.col("v") * F.lit(scale))
                .cast("long")
                .cast("decimal(38,0)")
            )
            .cast("double")
            / F.lit(scale)
            / F.count(F.lit(1))
        ).alias("cv")
    )
    return per_dim.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cv"))), lambda s: s["cv"]
        ).alias("cvec")
    )


def train_ivf_quantizer(
    corpus: DataFrame,
    n_clusters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Train (collect + L2-normalize) the IVF coarse quantizer once;
    reuse it across every query against the same corpus — the quantizer
    is a tiny driver-side model, retrained only when the corpus shifts."""
    import math

    def _l2(vals: list[float]) -> list[float]:
        # explicit left-to-right fold — bit-identical to the engines'
        # sequential list folds, so the normalized centroid literals
        # match the SQL oracle's exactly
        s = 0.0
        for v in vals:
            s += v * v
        n = math.sqrt(s)
        return [v / n for v in vals]

    return sorted(
        (r["cluster"], _l2(r["cvec"]))
        for r in ivf_centroids(corpus, n_clusters, id_col, vec_col).collect()
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_clusters: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantizer: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are assigned to their
    nearest coarse centroid (inverted lists); each query scores only
    the lists of its ``nprobe`` nearest centroids.

    The quantizer (n_clusters × dim doubles) is collected to the
    driver and unrolled into literal expressions — assignment and
    probe selection are then **map-only** (the standard IVF design:
    the coarse quantizer is a tiny driver-side model, the inverted
    lists are the distributed part). The only shuffle is the
    candidate equi-join on the cluster id. At real scale n_clusters
    is O(√n), keeping lists short and the join keys well-spread.
    """
    cents = (
        quantizer
        if quantizer is not None
        else train_ivf_quantizer(corpus, n_clusters, id_col, vec_col)
    )
    # centroid matrix + ids as two nested literals; per-row centroid
    # cosines come from one transform fold (not n_clusters unrolled dot
    # trees — plan-build cost scales with expression size)
    cent_lit = F.lit([cvec for _, cvec in cents])
    ids_lit = F.lit([cl for cl, _ in cents])

    def centroid_cos(vec: Column) -> Column:
        return F.transform(cent_lit, lambda c: dot(vec, c))

    def nearest_cluster(vec: Column) -> Column:
        # lexicographic max of (cos, -cluster): best cosine, ties → lowest id
        best = F.array_max(
            F.zip_with(
                centroid_cos(vec), ids_lit,
                lambda c, i: F.struct(c.alias("c"), (-i).alias("n")),
            )
        )
        return -best["n"]

    def probe_clusters(vec: Column) -> Column:
        # ascending sort of (-cos, cluster) structs → first nprobe
        scored = F.zip_with(
            centroid_cos(vec), ids_lit,
            lambda c, i: F.struct((-c).alias("nc"), i.alias("cl")),
        )
        return F.slice(
            F.transform(F.array_sort(scored), lambda s: s["cl"]), 1, nprobe
        )

    # two-step selects: the normalized vector is materialized as an
    # attribute before the 8-way centroid scoring references it, so the
    # normalization fold runs once per row (Catalyst keeps the
    # projections separate because the alias is non-cheap and
    # multiply-referenced)
    assigned = corpus.select(
        F.col(id_col).alias("c_id"), normalized(F.col(vec_col)).alias("c_vec")
    ).withColumn("cluster", nearest_cluster(F.col("c_vec")))
    probes = queries.select(
        F.col(id_col).alias("q_id"), normalized(F.col(vec_col)).alias("q_vec")
    ).withColumn("cluster", F.explode(probe_clusters(F.col("q_vec"))))
    scored = (
        F.broadcast(probes)
        .join(assigned, "cluster")
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", dot(F.col("q_vec"), F.col("c_vec")).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cos", "rank")
    )


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
    bucket key instead of a cross join; vectors L2-normalized at the
    scan so in-bucket scoring is a single dot fold."""
    q = queries.select(
        F.col(id_col).alias("q_id"),
        normalized(F.col(vec_col)).alias("q_vec"),
        sign_lsh_bucket(F.col(vec_col), dim, planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("c_id"),
        normalized(F.col(vec_col)).alias("c_vec"),
        sign_lsh_bucket(F.col(vec_col), dim, planes).alias("bucket"),
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", dot(F.col("q_vec"), F.col("c_vec")).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cos", "rank")
    )


def kmeans_fit(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: Optional[list[tuple[int, list[float]]]] = None,
    return_objectives: bool = False,
) -> (
    list[tuple[int, list[float]]]
    | tuple[list[tuple[int, list[float]]], list[float]]
):
    """Distributed spherical k-means (Lloyd iterations, cosine metric)
    over an embedding column — the iterative trainer for the IVF coarse
    quantizer (`ivf_topk` accepts its output via ``quantizer=``).

    Per iteration: (1) assignment is MAP-ONLY — the k×dim centroid
    matrix ships as one nested literal, each vector picks its argmax-
    cosine centroid inside the scan task; (2) the centroid update is
    one posexplode → (cluster, dim) hash-agg — shuffle volume is
    O(partitions × k × dim) partial sums, independent of corpus size;
    (3) only the k×dim centroid matrix (a few KB) returns to the
    driver. This is the canonical Spark iterative-algorithm shape:
    driver holds the model, executors hold the data, per-iteration
    traffic is model-sized, never data-sized.

    Deterministic end to end: seed centroids are the id-hash group
    means (`ivf_centroids`) — or the caller's ``init`` list of
    ``(cluster_id, centroid)`` (already L2-normalized) — per-dimension
    sums run in 2^-40 binary fixed point (exact integer arithmetic:
    rounded int64 quanta accumulated as decimal(38,0), so the mean is
    independent of shuffle/accumulation order and cannot silently wrap
    the way a raw int64 sum would past ~2^23 rows per cell), ties break
    toward the lowest cluster id. A cluster that loses all members
    keeps its previous centroid. Binary (not decimal) quantization is
    deliberate: scaling by 2^40 is an EXACT double operation in every
    engine, and round-half-away-from-zero of the identical exact value
    agrees everywhere — whereas double→DECIMAL casts double-round
    through `x*10^s` in some engines and disagree with exact-expansion
    HALF_UP at grid-edge values (observed: DuckDB vs Spark, 1e-12
    grid). That exactness is what lets `kmeans_fit_fixed` hash-match a
    DuckDB replay of the full trainer.

    ``return_objectives=True`` additionally returns, per iteration, the
    spherical-k-means objective Σ cos(vec, assigned centroid) of the
    model the iteration ASSIGNED with (i.e. the pre-update model) —
    computed inside the same aggregation pass as the centroid update,
    so a caller evaluating training curves (``embedding_kmeans``) pays
    one corpus pass per iteration instead of two. The objective rides
    the existing (cluster, pos) hash-agg as one extra partial sum
    (non-null only at pos 0) and sums to the driver with the
    model-sized collect; when the flag is off the plan is unchanged.
    """
    import math

    def _l2(vals):
        s = 0.0
        for v in vals:
            s += v * v
        n = math.sqrt(s) or 1.0
        return [v / n for v in vals]

    cents = init if init is not None else train_ivf_quantizer(
        corpus, k, id_col, vec_col
    )
    base = corpus.select(normalized(F.col(vec_col)).alias("kvec"))
    objectives: list[float] = []
    for _ in range(iters):
        cent_lit = F.lit([cvec for _, cvec in cents])
        ids_lit = F.lit([cl for cl, _ in cents])
        best = F.array_max(
            F.zip_with(
                F.transform(cent_lit, lambda c: dot(F.col("kvec"), c)),
                ids_lit,
                lambda c, i: F.struct(c.alias("c"), (-i).alias("n")),
            )
        )
        assigned = base.withColumn("cluster", -best["n"])
        if return_objectives:
            assigned = assigned.withColumn("bc", best["c"])
        scale = float(1 << 40)
        # the rounded longs accumulate as decimal(38,0) (128-bit sum):
        # an int64 accumulator would silently wrap past ~2^23 unit-norm
        # rows per (cluster,pos) in non-ANSI Spark; decimal keeps
        # ~10^25-row headroom, and DuckDB's SUM(BIGINT) is HUGEINT
        # already, so the oracle replay stays byte-exact.
        #
        # The posexplode -> (cluster, pos) hash-agg shape is KEPT after
        # a round-13 A/B against the obvious alternative (one
        # per-cluster agg of `dim` per-element decimal sums, no
        # explode): outputs were bit-identical but the wide form ran
        # 2x SLOWER at sf0.1 (2.89 -> 5.49 s median, alternating
        # same-JVM, iters=3) — 64 wide decimal buffers through one
        # aggregate lose to the narrow exploded rows streaming through
        # tight whole-stage codegen with map-side partial aggregation.
        cols = ["cluster"]
        if return_objectives:
            cols.append("bc")
        cv_agg = (
            F.sum(
                F.round(F.col("v") * F.lit(scale))
                .cast("long")
                .cast("decimal(38,0)")
            )
            .cast("double")
            / F.lit(scale)
            / F.count(F.lit(1))
        ).alias("cv")
        aggs1 = [cv_agg]
        aggs2 = [
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                lambda s: s["cv"],
            ).alias("cvec")
        ]
        if return_objectives:
            # per-row best cosine folded into the SAME hash-agg: non-null
            # only in each cluster's pos-0 group, re-summed per cluster
            aggs1.append(
                F.sum(F.when(F.col("pos") == 0, F.col("bc"))).alias("obj0")
            )
            aggs2.append(F.sum("obj0").alias("obj"))
        per_dim = (
            assigned.select(*cols, F.posexplode("kvec").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(*aggs1)
        )
        rows = per_dim.groupBy("cluster").agg(*aggs2).collect()
        if return_objectives:
            objectives.append(
                float(sum(r["obj"] for r in rows if r["obj"] is not None))
            )
        updated = {r["cluster"]: _l2(r["cvec"]) for r in rows}
        cents = sorted(
            (cl, updated.get(cl, old)) for cl, old in cents
        )
    if return_objectives:
        return cents, objectives
    return cents


def semantic_dedup(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    eps: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public):
    cluster-then-prune semantic duplicates over an embedding column.
    Vectors assign to their nearest coarse centroid (cosine, map-only);
    WITHIN each cluster, any vector with a lower-id neighbor at cosine
    >= ``eps`` is dropped, so exactly the lowest-id member of every
    semantic group survives (deterministic representative choice —
    the paper keeps one random member).  Returns the surviving
    ``(id, cluster)`` rows.

    This is the training-data counterpart of near-dup text dedup for
    paraphrases/translations that share no tokens. The SemDeDup trick
    is the scale property: pairwise cosine runs ONLY inside clusters
    (one cluster-keyed self-join) — O(Σ kᵢ²), not O(n²). At corpus
    scale raise ``len(centroids)`` so expected cluster size stays
    bounded; a skewed giant cluster is the signal to re-train with
    more centroids (or recurse into it).
    """
    assigned = kmeans_assign(corpus, centroids, id_col, vec_col).select(
        id_col, "cluster"
    )
    nv = corpus.select(F.col(id_col), normalized(F.col(vec_col)).alias("__nv"))
    members = assigned.join(nv, id_col)
    a = members.select(
        F.col(id_col).alias("__ida"), F.col("cluster"), F.col("__nv").alias("__va")
    )
    b = members.select(
        F.col(id_col).alias("__idb"), F.col("cluster"), F.col("__nv").alias("__vb")
    )
    drops = (
        a.join(b, "cluster")
        .where(F.col("__ida") > F.col("__idb"))
        .where(dot(F.col("__va"), F.col("__vb")) >= F.lit(float(eps)))
        .select(F.col("__ida").alias(id_col))
        .distinct()
    )
    return assigned.join(drops, id_col, "left_anti")


def semantic_dedup_np(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    eps: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Vectorized SemDeDup kernel — same decisions as ``semantic_dedup``
    via one BLAS gram matrix per cluster instead of an interpreted
    per-pair expression fold (the pq_encode/pq_encode_np relationship).
    Each ``applyInPandas`` call receives ONE whole cluster (Spark's
    group contract), normalizes it, computes X·Xᵀ, and keeps row i iff
    no lower-id row j has cosine >= eps.  Cluster size bounds per-task
    memory — identical to the expression plan's shuffle bound; raise
    the centroid count to shrink both.  float64 matmul vs the
    sequential fold differs only at ~1e-15, so decisions match except
    on exact-threshold ties (equivalence pinned in tests)."""
    import numpy as np
    import pandas as pd

    assigned = kmeans_assign(corpus, centroids, id_col, vec_col).select(
        id_col, "cluster"
    )
    members = assigned.join(
        corpus.select(F.col(id_col), _to_double(F.col(vec_col)).alias("__v")),
        id_col,
    )

    def prune(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col, ignore_index=True)
        X = np.asarray(pdf["__v"].tolist(), dtype=np.float64)
        norms = np.sqrt((X * X).sum(axis=1))
        norms[norms == 0.0] = 1.0
        Xn = X / norms[:, None]
        S = Xn @ Xn.T
        # keep i iff no j < i with cos >= eps (ids ascend with row index)
        dup = np.triu(S >= eps, k=1).any(axis=0)
        keep = pdf.loc[~dup, [id_col, "cluster"]]
        return keep

    return members.groupBy("cluster").applyInPandas(
        prune, f"{id_col} long, cluster long"
    )


def kmeans_assign(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest (cosine) centroid — map-only,
    same literal-matrix fold as training. Returns (id, cluster, cos)."""
    cent_lit = F.lit([cvec for _, cvec in centroids])
    ids_lit = F.lit([cl for cl, _ in centroids])
    nv = normalized(F.col(vec_col))
    base = corpus.select(F.col(id_col), nv.alias("kvec"))
    best = F.array_max(
        F.zip_with(
            F.transform(cent_lit, lambda c: dot(F.col("kvec"), c)),
            ids_lit,
            lambda c, i: F.struct(c.alias("c"), (-i).alias("n")),
        )
    )
    return base.select(
        id_col,
        (-best["n"]).alias("cluster"),
        best["c"].alias("cos"),
    )


def _probe_trainable(label: Column, dim: int, vec_col: str) -> Column:
    """Row-trainability predicate shared by both probe trainers: the
    label casts to a non-NULL double, the embedding exists with ≥ dim
    elements, and the first dim elements carry no NULLs. Deliberately
    phrased over the RAW column (null/size checks + a slice-bounded
    exists) so the filter never evaluates the full-array cast — Filter
    has no subexpression elimination, so conjuncts re-deriving a heavy
    projected expression re-run it per conjunct per row (the
    filter-inlining pathology documented in SCALE.md)."""
    vec = F.col(vec_col)
    return (
        label.cast("double").isNotNull()
        & vec.isNotNull()
        & (F.size(vec) >= dim)
        & ~F.exists(F.slice(vec, 1, dim), lambda x: x.isNull())
    )


def linear_probe_fit(
    corpus: DataFrame,
    label: Column,
    dim: int = 8,
    iters: int = 3,
    lr: float = 0.5,
    vec_col: str = "embedding",
    init: Optional[list[float]] = None,
) -> list[float]:
    """Distributed LINEAR PROBE trainer: least-squares gradient descent
    for ŷ = w·x + b over the first ``dim`` embedding dimensions — the
    standard train-a-linear-probe-on-embeddings step of a curation
    pipeline (is this doc high-quality / on-topic / in-domain?), run
    where the embeddings live instead of collecting them.

    The Spark iterative shape matches ``kmeans_fit``: per iteration the
    residual and per-feature gradient terms are computed inside the
    scan (the current weights ship as ONE array literal), one
    posexplode → (pos) hash-agg reduces them — shuffle volume is
    O(partitions × (dim+1)) partial sums, independent of corpus size —
    and only dim+1 gradient scalars return to the driver, which applies
    the update. Least squares (not logistic) is deliberate: the
    gradient uses only +/× so the 2^-40 binary fixed-point sum makes
    every iteration byte-exact against a single-node SQL replay
    (`linear_probe_fit_fixed`'s DuckDB oracle) — a transcendental
    sigmoid would diverge across libm implementations. ``lr`` should be
    an exact binary fraction (0.5, 0.25) for the same reason.

    Returns dim+1 weights, bias LAST. The prediction fold is
    ``list_dot_product``-compatible (0-seeded left fold, bias added
    after), the per-term quantum is ``round(err * x * 2^40)`` summed as
    decimal(38,0) (128-bit, order-independent, no int64 wrap), and the
    driver-side update ``w - lr*((g/2^40)/n)`` uses the identical
    floating-op sequence the oracle's CTE chain replays.
    """
    scale = float(1 << 40)
    w = list(init) if init is not None else [0.0] * (dim + 1)
    if len(w) != dim + 1:
        raise ValueError(f"init must have dim+1={dim + 1} weights (bias last)")
    base = corpus.filter(_probe_trainable(label, dim, vec_col)).select(
        F.slice(_to_double(F.col(vec_col)), 1, dim).alias("px"),
        label.cast("double").alias("py"),
    )
    # Untrainable rows are excluded BEFORE the gradient: a NULL label,
    # short array, or NULL element would NULL gradient terms (skipped
    # by SUM but still counted in n), silently shrinking the effective
    # step with a PER-POSITION-inconsistent denominator — and diverging
    # from the DuckDB replay. Filtering keeps the n denominator and the
    # gradient sums aligned by construction (the oracle applies the
    # identical predicate).
    for _ in range(iters):
        w_lit = F.lit(w[:dim])
        pred = dot(F.col("px"), w_lit) + F.lit(w[dim])
        err = pred - F.col("py")
        garr = F.concat(
            F.transform(
                F.col("px"),
                lambda x: F.round(err * x * F.lit(scale)).cast("long"),
            ),
            F.array(F.round(err * F.lit(scale)).cast("long")),
        )
        sums = (
            base.select(F.posexplode(garr).alias("pos", "gq"))
            .groupBy("pos")
            .agg(
                F.sum(F.col("gq").cast("decimal(38,0)")).alias("g"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        if not sums:
            raise ValueError(
                "linear_probe_fit: no trainable rows (all labels/"
                f"embeddings NULL or shorter than dim={dim})"
            )
        for row in sums:  # dim+1 rows — model-sized driver traffic
            g = float(row["g"]) / scale
            w[row["pos"]] = w[row["pos"]] - lr * (g / row["n"])
    return w


def logistic_probe_fit(
    corpus: DataFrame,
    label: Column,
    dim: int = 8,
    iters: int = 3,
    lr: float = 0.25,
    vec_col: str = "embedding",
    init: Optional[list[float]] = None,
) -> tuple[list[float], list[float]]:
    """Distributed LOGISTIC-regression probe trainer — the shape real
    curation filters use (is this doc high-quality? in-domain?), run
    where the embeddings live. Same driver-holds-model /
    executors-hold-data economics as ``linear_probe_fit``: per
    iteration the current weights ship as ONE array literal, the
    per-row gradient ``(sigmoid(w·x+b) - y)·x`` and the numerically
    stable BCE loss ``max(z,0) - y·z + log1p(exp(-|z|))`` fold inside
    the scan, one posexplode→pos hash-agg reduces dim+2 partial sums
    (dim+1 gradient slots + the loss), and dim+2 scalars return to the
    driver per iteration.

    Unlike the linear probe there is NO byte-exact replay — sigmoid is
    transcendental and diverges across libm implementations — so the
    oracle contract is the INVARIANT instead: full-batch GD on the
    (convex) BCE objective with a conservative step must not increase
    the loss; ``logistic_probe_fit``'s catalog entry emits the
    per-iteration loss-non-increasing booleans the oracle asserts (the
    ``embedding_kmeans`` gating pattern).

    Returns ``(weights, losses)``: dim+1 weights (bias LAST,
    ``linear_probe_score``-compatible) and iters+1 mean losses (before
    each update, plus after the final one). NULL label/embedding rows
    are excluded up front, mirroring ``linear_probe_fit``.
    """
    w = list(init) if init is not None else [0.0] * (dim + 1)
    if len(w) != dim + 1:
        raise ValueError(f"init must have dim+1={dim + 1} weights (bias last)")
    base = corpus.filter(_probe_trainable(label, dim, vec_col)).select(
        F.slice(_to_double(F.col(vec_col)), 1, dim).alias("px"),
        label.cast("double").alias("py"),
    )

    def pass_once(weights: list[float], with_grad: bool):
        z = dot(F.col("px"), F.lit(weights[:dim])) + F.lit(weights[dim])
        loss = (
            F.greatest(z, F.lit(0.0))
            - z * F.col("py")
            + F.log1p(F.exp(-F.abs(z)))
        )
        if not with_grad:
            row = base.agg(
                F.sum(loss).alias("l"), F.count(F.lit(1)).alias("n")
            ).collect()[0]
            if not row["n"]:
                raise ValueError(
                    "logistic_probe_fit: no trainable rows (all labels/"
                    f"embeddings NULL or shorter than dim={dim})"
                )
            return None, float(row["l"]) / row["n"]
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        err = p - F.col("py")
        garr = F.concat(
            F.transform(F.col("px"), lambda x: err * x),
            F.array(err, loss),
        )
        sums = (
            base.select(F.posexplode(garr).alias("pos", "t"))
            .groupBy("pos")
            .agg(F.sum("t").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        if not sums:
            raise ValueError(
                "logistic_probe_fit: no trainable rows (all labels/"
                f"embeddings NULL or shorter than dim={dim})"
            )
        by_pos = {r["pos"]: (float(r["s"]), r["n"]) for r in sums}
        n = by_pos[0][1]
        grad = [by_pos[j][0] / n for j in range(dim + 1)]
        return grad, by_pos[dim + 1][0] / n

    # Backtracking (step-halving) line search: fixed-lr full-batch GD
    # only guarantees descent below the data-dependent curvature bound
    # (~4n/||X||² for BCE) — embedding corpora with large feature norms
    # can overshoot and break the loss-non-increasing oracle contract.
    # Each candidate step is accepted only if the folded loss did not
    # increase; otherwise the step halves and retries. In the
    # no-overshoot case the grad pass at the accepted point doubles as
    # the acceptance check for the NEXT step, so the job count matches
    # the unguarded loop exactly (iters+1 passes); a halving costs one
    # extra pass. After 20 halvings (lr·2⁻²⁰, gradient ≈ 0 territory)
    # the update is skipped outright — loss unchanged, invariant holds.
    losses: list[float] = []
    grad, loss = pass_once(w, with_grad=True)
    losses.append(loss)
    for it in range(iters):
        last = it == iters - 1
        step = lr
        for _halve in range(20):
            cand = [wj - step * gj for wj, gj in zip(w, grad)]
            cand_grad, cand_loss = pass_once(cand, with_grad=not last)
            if cand_loss <= loss:
                break
            step /= 2.0
        else:
            cand, cand_grad, cand_loss = w, grad, loss  # skip the update
        w, grad, loss = cand, cand_grad, cand_loss
        losses.append(loss)
    return w, losses


def linear_probe_score(
    corpus: DataFrame,
    weights: list[float],
    threshold: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Score every vector with a trained linear probe — map-only: the
    weights ship as one literal, ŷ = w·x + b folds inside the scan,
    and the boolean keep-decision is ŷ > threshold. The inference half
    of ``linear_probe_fit``; at 100 TB this is a pure scan."""
    dim = len(weights) - 1
    feats = F.slice(_to_double(F.col(vec_col)), 1, dim)
    score = dot(feats, F.lit(weights[:dim])) + F.lit(weights[dim])
    return corpus.select(
        F.col(id_col),
        score.alias("score"),
        (score > threshold).alias("keep"),
    )


def quantize_embeddings(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column — the 4×
    storage/bandwidth reduction step before a corpus-scale ANN index
    (dequantized value = q / scale, |error| <= 0.5/scale per element).

    Map-only Catalyst expressions; the per-vector scale (127/max|x|)
    is materialized as a COLUMN in a first projection so the per-
    element transform reads it instead of re-deriving the array max
    per element (higher-order functions are interpreted without CSE).
    Rounding is floor(x*scale + 0.5) — identical on every engine,
    unlike round()'s half-even/half-away divergence.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    mx = F.array_max(F.transform(v, lambda x: F.abs(x)))
    base = corpus.select(
        F.col(id_col),
        v.alias("__v"),
        F.when(mx > 0, F.lit(127.0) / mx).otherwise(F.lit(1.0)).alias("scale"),
    )
    q = F.transform(
        F.col("__v"), lambda x: F.floor(x * F.col("scale") + F.lit(0.5)).cast("long")
    )
    return base.select(id_col, "scale", q.alias("qvec"))


# ---------------------------------------------------------------------------
# Scalar quantization (per-dimension affine uint8) + asymmetric search
# ---------------------------------------------------------------------------

# 2^-20 binary fixed point: float32→double→×2^20→floor is exact in IEEE
# (power-of-two scaling), so every engine derives identical integers and
# the whole SQ pipeline — train, encode, dequantize, score — is pure
# int64 arithmetic with a byte-exact oracle replay.
SQ_FP = 1 << 20


def _sq_fixed(vec: Column) -> Column:
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * F.lit(float(SQ_FP))).cast("long")
    )


def sq_train(
    corpus: DataFrame,
    vec_col: str = "embedding",
) -> tuple[list[int], list[int]]:
    """Train a per-dimension affine uint8 scalar quantizer: the global
    min/max of every dimension, in 2^-20 fixed point. One explode +
    groupBy(dim) aggregate (64 groups, map-side combined); the model
    collected to the driver is 2×dim int64s — model-sized traffic, the
    same contract as the k-means/IVF trainers."""
    dims = corpus.select(F.posexplode(_sq_fixed(F.col(vec_col))).alias("dim", "x"))
    rows = dims.groupBy("dim").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    ).collect()
    mns = [0] * len(rows)
    mxs = [0] * len(rows)
    for r in rows:
        mns[r["dim"]] = int(r["mn"])
        mxs[r["dim"]] = int(r["mx"])
    return mns, mxs


def sq_encode(
    corpus: DataFrame,
    mns: list[int],
    mxs: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector to uint8 codes: code_i = ⌊(x_i − mn_i)·255 /
    (mx_i − mn_i)⌋ in int64 fixed point (constant dims encode 0). 4×
    compression (the stored/scanned representation); map-only, the
    quantizer ships as two array literals. floor(a/b) on non-negative
    int64 here is exact under double division (numerator ≤ 2^30, the
    quotient's IEEE error ≪ 1/denominator), matching the oracle's
    integer ``//``."""
    mn = F.lit(mns).cast("array<long>")
    mx = F.lit(mxs).cast("array<long>")
    # materialize the fixed-point array as a column first — higher-
    # order functions are interpreted without CSE, so element-wise
    # references into an inline expression would re-derive the whole
    # transform per dimension (the quantize_embeddings lesson); then
    # chain two LINEAR zip_with passes instead of element_at-over-
    # sequence (which is O(dim²) index lookups per row)
    base = corpus.select(F.col(id_col), _sq_fixed(F.col(vec_col)).alias("__xi"))
    paired = F.zip_with(
        F.col("__xi"), mn, lambda x, m: F.struct(x.alias("x"), m.alias("m"))
    )
    codes = F.zip_with(
        paired,
        mx,
        # clamp to [0, 255] (FAISS SQ8 behavior): encoding a vector
        # outside the trained per-dimension range — the natural
        # incremental use of a persisted quantizer — must still honor
        # the uint8 contract; byte-identical to np.clip in the twin
        lambda p, mxv: F.when(mxv == p["m"], F.lit(0).cast("long")).otherwise(
            F.greatest(
                F.lit(0).cast("long"),
                F.least(
                    F.lit(255).cast("long"),
                    F.floor(((p["x"] - p["m"]) * 255) / (mxv - p["m"])).cast("long"),
                ),
            )
        ),
    )
    return base.select(id_col, codes.alias("codes"))


def sq_adc_topk(
    codes: DataFrame,
    queries: DataFrame,
    mns: list[int],
    mxs: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 100_000,
) -> DataFrame:
    """Asymmetric top-k over scalar-quantized codes: the query stays
    exact (fixed-point), each corpus row dequantizes from its uint8
    codes on the fly (dq_i = mn_i + ⌊code_i·(mx_i−mn_i)/255⌋) and
    scores Σ(q_i − dq_i)² — all int64, so ranking is byte-exact on any
    engine. The scan reads CODES (dim bytes/row), not float vectors —
    the 4× bandwidth cut is the point of SQ at corpus scale; the
    quantizer is two dim-length literals, no join for model access.
    Queries broadcast (small side by contract, loudly capped)."""
    n = queries.limit(max_queries + 1).count()
    if n > max_queries:
        raise ValueError(
            f"sq_adc_topk: query side exceeds max_queries={max_queries} rows; "
            "it is broadcast against the code table. Pass a smaller query "
            "set (or raise max_queries deliberately)."
        )
    mn = F.lit(mns).cast("array<long>")
    mx = F.lit(mxs).cast("array<long>")
    # linear zip_with dequantization (see sq_encode on why not
    # element_at-over-sequence)
    paired = F.zip_with(
        F.col("codes"), mn, lambda c, m: F.struct(c.alias("c"), m.alias("m"))
    )
    dq = F.zip_with(
        paired,
        mx,
        lambda p, mxv: p["m"]
        + F.floor((p["c"] * (mxv - p["m"])) / 255).cast("long"),
    )
    corpus = codes.select(F.col(id_col).alias("c_id"), dq.alias("__dq"))
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("q_id"), _sq_fixed(F.col(vec_col)).alias("__q")
        )
    )
    scored = (
        q.crossJoin(corpus)
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            F.aggregate(
                F.zip_with(F.col("__q"), F.col("__dq"), lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("sqdist"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sqdist").asc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "sqdist", "rank")
    )


def sq_encode_np(
    corpus: DataFrame,
    mns: list[int],
    mxs: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Vectorized twin of ``sq_encode`` (same split as ``pq_encode`` /
    ``pq_encode_np``): whole-batch numpy integer quantization —
    byte-identical to the expression path (int64 floor-div on
    non-negative operands), pinned in tests."""
    import numpy as np
    import pandas as pd

    mn = np.asarray(mns, dtype=np.int64)
    span = np.asarray(mxs, dtype=np.int64) - mn
    safe = np.where(span == 0, 1, span)

    def enc(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.floor(
                np.asarray(pdf[vec_col].tolist(), dtype=np.float64) * SQ_FP
            ).astype(np.int64)
            # clamp mirrors the expression path (FAISS SQ8): encoding
            # against a previously trained quantizer keeps the uint8
            # contract for out-of-range values
            codes = np.clip(np.where(span == 0, 0, ((X - mn) * 255) // safe), 0, 255)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(dtype=np.int64),
                    "codes": list(codes),
                }
            )

    return corpus.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        enc, f"{id_col} long, codes array<long>"
    )


def build_sq_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize an SQ8 index on disk: the uint8 code table as
    parquet plus the per-dimension quantizer (fixed-point min/max) as
    a tiny JSON sidecar — the same build-once/query-many shape as
    ``build_ivf_index``/``build_ivf_pq_index``. Queries then read
    dim bytes per row instead of dim floats (4× scan cut) and skip
    the train + encode passes entirely; at 100 TB the one-time encode
    amortizes across every future query batch."""
    import json as _json
    import os as _os

    mns, mxs = sq_train(corpus, vec_col)
    sq_encode_np(corpus, mns, mxs, id_col, vec_col).write.mode(
        "overwrite"
    ).parquet(_os.path.join(path, "codes"))
    with open(_os.path.join(path, "quantizer.json"), "w") as f:
        _json.dump({"mns": mns, "mxs": mxs}, f)


def sq_index_topk(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 100_000,
) -> DataFrame:
    """Asymmetric top-k THROUGH a persisted SQ8 index: codes and
    quantizer read from disk, scoring identical to ``sq_adc_topk_np``
    (byte-exact int64 pipeline, same oracle as the cold entry — the
    cold/warm delta is the measured train+encode amortization)."""
    import json as _json
    import os as _os

    with open(_os.path.join(path, "quantizer.json")) as f:
        q = _json.load(f)
    codes = spark.read.parquet(_os.path.join(path, "codes"))
    return sq_adc_topk_np(
        codes, queries, q["mns"], q["mxs"], k=k,
        id_col=id_col, vec_col=vec_col, max_queries=max_queries,
    )


def sq_adc_topk_np(
    codes: DataFrame,
    queries: DataFrame,
    mns: list[int],
    mxs: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 100_000,
) -> DataFrame:
    """Vectorized twin of ``sq_adc_topk`` (the production kernel, same
    split as ``brute_force_topk`` / ``brute_force_topk_np``): queries
    collect to a fixed-point int64 matrix (small side by contract,
    loudly capped) and each Arrow code batch dequantizes + scores with
    whole-array numpy integer ops — dequantize is two broadcasts and a
    floor-div over the batch, distances one squared-difference sum.
    All arithmetic is int64 (floor-div operands non-negative), so the
    result is BYTE-IDENTICAL to the expression path — pinned in tests.
    Each batch emits only its local top-(k+1) per query (argpartition),
    so the global rank input is partitions × queries × (k+1) rows at
    any corpus size."""
    import numpy as np
    import pandas as pd

    qrows = (
        queries.select(F.col(id_col), F.col(vec_col)).limit(max_queries + 1).collect()
    )
    if len(qrows) > max_queries:
        raise ValueError(
            f"sq_adc_topk_np: query side exceeds max_queries={max_queries} "
            "rows; it is collected to the driver and broadcast per task. "
            "Pass a smaller query set (or raise max_queries deliberately)."
        )
    q_ids = np.asarray([r[0] for r in qrows], dtype=np.int64)
    Q = np.floor(
        np.asarray([list(r[1]) for r in qrows], dtype=np.float64) * SQ_FP
    ).astype(np.int64)
    mn = np.asarray(mns, dtype=np.int64)
    span = np.asarray(mxs, dtype=np.int64) - mn
    kk = k + 1  # spare so dropping a self-pair can't cost a hit

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            C = np.asarray(pdf["codes"].tolist(), dtype=np.int64)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            dq = mn + (C * span) // 255
            frames = []
            for j in range(Q.shape[0]):
                diff = Q[j] - dq
                d = (diff * diff).sum(axis=1)
                cand = np.nonzero(ids != q_ids[j])[0]
                if cand.size == 0:
                    continue
                if cand.size > kk:
                    # argpartition on distance alone would break the
                    # (sqdist asc, c_id asc) contract at the cut: integer
                    # sqdist over uint8 codes ties often (duplicate rows
                    # collapse to identical codes), so widen the cut to
                    # every candidate tied with the kk-th distance before
                    # the lexsort truncates on the full tie-break.
                    part = np.argpartition(d[cand], kk - 1)
                    thresh = d[cand[part[kk - 1]]]
                    cand = cand[d[cand] <= thresh]
                order = np.lexsort((ids[cand], d[cand]))
                cand = cand[order][:kk]
                frames.append(
                    pd.DataFrame(
                        {
                            "q_id": np.full(cand.size, q_ids[j]),
                            "c_id": ids[cand],
                            "sqdist": d[cand],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    scored = codes.select(F.col(id_col), F.col("codes")).mapInPandas(
        score, "q_id long, c_id long, sqdist long"
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sqdist").asc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "sqdist", "rank")
    )


# ---------------------------------------------------------------------------
# Persistent IVF index (build once, query many)
# ---------------------------------------------------------------------------


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    n_clusters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize an IVF index on disk: the corpus written
    cluster-PARTITIONED (one directory per inverted list) plus the
    quantizer as a tiny JSON sidecar.

    This converts every subsequent query from a full-corpus scan into
    a PARTITION-PRUNED read of nprobe/n_clusters of the data — at
    100 TB the probe cost is bounded by list size, not corpus size,
    and the pruning happens in the parquet scan (no shuffle, no
    filter evaluation over skipped lists). Amortizes the one-time
    assignment shuffle across every future query.
    """
    import json as _json
    import os as _os

    cents = train_ivf_quantizer(corpus, n_clusters, id_col, vec_col)
    assigned = kmeans_assign(corpus, cents, id_col, vec_col).select(
        id_col, "cluster"
    )
    vecs = corpus.join(assigned, id_col)
    vecs.write.mode("overwrite").partitionBy("cluster").parquet(
        _os.path.join(path, "vectors")
    )
    with open(_os.path.join(path, "quantizer.json"), "w") as f:
        _json.dump([[cl, cv] for cl, cv in cents], f)


def ivf_index_topk(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a persisted IVF index: pick each query's ``nprobe``
    nearest centroids (map-only against the JSON quantizer), then scan
    ONLY those cluster partitions (`cluster IN (...)` reaches the scan
    as a partition filter) and rank candidates."""
    import json as _json
    import os as _os

    from pyspark.sql import Window

    with open(_os.path.join(path, "quantizer.json")) as f:
        cents = [(int(cl), [float(x) for x in cv]) for cl, cv in _json.load(f)]

    cent_lit = F.lit([cv for _, cv in cents])
    ids_lit = F.lit([cl for cl, _ in cents])
    qn = queries.select(
        F.col(id_col).alias("q_id"), normalized(F.col(vec_col)).alias("q_vec")
    )
    scored_cents = F.zip_with(
        F.transform(cent_lit, lambda c: dot(F.col("q_vec"), c)),
        ids_lit,
        lambda c, i: F.struct(c.alias("c"), i.alias("cl")),
    )
    probes = F.slice(F.reverse(F.array_sort(scored_cents)), 1, nprobe)
    q = qn.withColumn(
        "cluster", F.explode(F.transform(probes, lambda s: s["cl"]))
    )
    # distinct probe set, collected driver-side (tiny: <= queries×nprobe)
    # so the IN-list lands in the scan as a partition filter
    probe_ids = sorted(
        {r["cluster"] for r in q.select("cluster").distinct().collect()}
    )
    vecs = (
        spark.read.parquet(_os.path.join(path, "vectors"))
        .filter(F.col("cluster").isin(probe_ids))
        .select(
            F.col("cluster"),
            F.col(id_col).alias("c_id"),
            normalized(F.col(vec_col)).alias("c_vec"),
        )
    )
    cand = q.join(vecs, "cluster").filter(F.col("q_id") != F.col("c_id"))
    scored = cand.select(
        "q_id", "c_id", dot(F.col("q_vec"), F.col("c_vec")).alias("cos")
    ).groupBy("q_id", "c_id").agg(F.max("cos").alias("cos"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cos", "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ's compression half: FAISS-style m×ks codes)
# ---------------------------------------------------------------------------


def pq_seed_codebooks(dim: int, m: int = 8, ks: int = 16) -> list[list[list[float]]]:
    """Deterministic md5-derived PQ codebooks (``m`` subspaces ×
    ``ks`` centroids × dim/m) — the reproducible seed for ``pq_train``
    and the fixture the SQL oracle can embed verbatim."""
    import hashlib

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    books = []
    for s in range(m):
        cents = []
        for c in range(ks):
            vals: list[float] = []
            i = 0
            while len(vals) < dsub:
                digest = hashlib.md5(f"pq-{s}-{c}-{i}".encode()).digest()
                for off in range(0, 16, 2):
                    raw = int.from_bytes(digest[off : off + 2], "big")
                    vals.append((raw / 32767.5) - 1.0)
                    if len(vals) == dsub:
                        break
                i += 1
            cents.append(vals)
        books.append(cents)
    return books


def _l2sq(a: Column, b: Column) -> Column:
    """Σ (aᵢ-bᵢ)² — sequential fold, deterministic."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors to PQ codes: per subspace, the index of the
    nearest (L2) codebook centroid — dim floats become m small ints
    (m=8, ks=16 ⇒ 64-dim float32 compresses 64×, the FAISS-style
    storage format for billion-scale ANN).

    Map-only: the whole m×ks×(dim/m) codebook ships as ONE nested
    literal and each vector folds through it inside its scan task; ties
    break toward the lowest code (struct array_min). No shuffle at any
    scale.
    """
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    cb_lit = F.lit(codebooks)
    vec = _to_double(F.col(vec_col))

    def code_for(s: Column) -> Column:
        sub = F.slice(vec, s * dsub + 1, dsub)
        cands = F.transform(
            F.element_at(cb_lit, s + 1),
            lambda c, i: F.struct(_l2sq(sub, c).alias("d"), i.alias("code")),
        )
        return F.array_min(cands)["code"]

    codes = F.transform(F.sequence(F.lit(0), F.lit(m - 1)), code_for)
    return corpus.select(F.col(id_col), codes.alias("codes"))


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    ks: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Train PQ codebooks with Lloyd iterations over ALL subspaces in
    one distributed pass per iteration: explode each vector into its m
    subvectors once (same data volume — m arrays of dim/m), assign
    each to its nearest centroid map-side (nested codebook literal),
    and update with a (sub, code, pos) hash-agg whose shuffle volume is
    O(partitions × m × ks × dim/m) partial sums, independent of corpus
    size. Only the model (m×ks×dim/m floats) returns to the driver per
    iteration — the same driver-holds-model shape as ``kmeans_fit``.

    Deterministic: data-seeded start (ks lowest-id vectors; md5 seed
    when the corpus is smaller), decimal per-dimension sums, ties
    toward the lowest code; empty cells keep their previous centroid.
    """
    dim_row = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = int(dim_row["d"])
    dsub = dim // m
    # data-seeded start (deterministic: the ks lowest-id vectors seed
    # every subspace) -- random-cube seeds waste centroids on empty
    # regions when the data lives on a manifold (e.g. unit sphere)
    seed_rows = (
        corpus.select(F.col(id_col), _to_double(F.col(vec_col)).alias("v"))
        .orderBy(id_col)
        .limit(ks)
        .collect()
    )
    if len(seed_rows) >= ks:
        books = [
            [list(r["v"][s * dsub : (s + 1) * dsub]) for r in seed_rows]
            for s in range(m)
        ]
    else:
        books = pq_seed_codebooks(dim, m, ks)
    vec = _to_double(F.col(vec_col))
    subs = corpus.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.struct(
                    s.alias("sub"), F.slice(vec, s * dsub + 1, dsub).alias("sv")
                ),
            )
        ).alias("x")
    ).select(F.col("x.sub").alias("sub"), F.col("x.sv").alias("sv"))
    for _ in range(iters):
        cb_lit = F.lit(books)
        cands = F.transform(
            F.element_at(cb_lit, F.col("sub") + 1),
            lambda c, i: F.struct(_l2sq(F.col("sv"), c).alias("d"), i.alias("code")),
        )
        assigned = subs.withColumn("code", F.array_min(cands)["code"])
        per_dim = (
            assigned.select("sub", "code", F.posexplode("sv").alias("pos", "v"))
            .groupBy("sub", "code", "pos")
            .agg(
                (
                    F.sum(F.col("v").cast("decimal(27,12)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("cv")
            )
        )
        rows = (
            per_dim.groupBy("sub", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                    lambda s: s["cv"],
                ).alias("cvec")
            )
            .collect()
        )
        updated = {(r["sub"], r["code"]): list(r["cvec"]) for r in rows}
        books = [
            [updated.get((s, c), books[s][c]) for c in range(ks)]
            for s in range(m)
        ]
    return books


def pq_adc_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 100_000,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: each corpus
    vector's approximate distance to a query is the sum over subspaces
    of ‖q_sub − codebook[sub][code]‖² — the query stays exact, the
    corpus stays 64×-compressed.

    This is the REAL ADC kernel: the per-query m×ks distance table is
    precomputed once (driver-side — queries are the small side by
    contract, capped like ``brute_force_topk_np``) and shipped as a
    broadcast column, so scoring a corpus row is m table LOOKUPS over
    its m-byte code array — no per-pair distance arithmetic, and the
    scan touches codes, not vectors (the point of PQ). Table entries
    sum ``(q_i−c_i)²`` sequentially in IEEE doubles, so results are
    bit-identical to the SQL oracle's fold. Output: (q_id, c_id,
    adist, rank), ascending distance, ties toward the lower corpus id;
    adist emitted rounded (cross-engine list_sum ulp).
    """
    m = len(codebooks)
    qrows = (
        queries.select(F.col(id_col), F.col(vec_col)).limit(max_queries + 1).collect()
    )
    if len(qrows) > max_queries:
        raise ValueError(
            f"pq_adc_topk: query side exceeds max_queries={max_queries} rows; "
            "it is collected to compute per-query distance tables. Pass a "
            "smaller query set (or raise max_queries deliberately)."
        )
    dsub = len(codebooks[0][0])

    def dtable(vec) -> list[list[float]]:
        out = []
        for s in range(m):
            sub = vec[s * dsub : (s + 1) * dsub]
            row = []
            for c in codebooks[s]:
                acc = 0.0
                for x, y in zip(sub, c):
                    d = float(x) - y
                    acc += d * d
                row.append(acc)
            out.append(row)
        return out

    spark = codes.sparkSession
    q = F.broadcast(
        spark.createDataFrame(
            [(int(r[0]), dtable(list(r[1]))) for r in qrows],
            "q_id long, dtab array<array<double>>",
        )
    )
    pair = q.crossJoin(codes.select(F.col(id_col).alias("c_id"), "codes")).filter(
        F.col("q_id") != F.col("c_id")
    )
    contrib = F.zip_with(
        F.col("dtab"),
        F.col("codes"),
        lambda row, c: F.element_at(row, c + 1),
    )
    scored = pair.select(
        "q_id",
        "c_id",
        F.aggregate(contrib, F.lit(0.0), lambda a, x: a + x).alias("adist"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adist").asc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        # rank on full precision; emit rounded (cross-engine list_sum
        # accumulation differs in the last ulp)
        .select("q_id", "c_id", F.round("adist", 6).alias("adist"), "rank")
    )



def build_ivf_pq_index(
    corpus: DataFrame,
    path: str,
    n_clusters: int = 8,
    m: int = 8,
    ks: int = 16,
    train_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize a FAISS-style IVF-PQ index: the coarse quantizer
    partitions the corpus into inverted lists on disk (directory
    pruning at query time, as ``build_ivf_index``) and each list row
    stores the PQ CODES — m small ints — instead of the float vector.
    The index is both pruned (read nprobe/n_clusters of the rows) and
    ~64× smaller per row (read codes, not vectors): the layout that
    serves billion-vector ANN from object storage.

    PQ codebooks train on the RESIDUAL-free vectors (plain per-vector
    PQ — residual encoding would couple the codebooks to the coarse
    quantizer; kept orthogonal here) and persist in the JSON sidecar
    next to the coarse centroids.
    """
    import json as _json
    import os as _os

    cents = train_ivf_quantizer(corpus, n_clusters, id_col, vec_col)
    books = pq_train(corpus, m=m, ks=ks, iters=train_iters,
                     vec_col=vec_col, id_col=id_col)
    assigned = kmeans_assign(corpus, cents, id_col, vec_col).select(
        id_col, "cluster"
    )
    coded = pq_encode(corpus, books, id_col, vec_col)
    rows = coded.join(assigned, id_col)
    rows.write.mode("overwrite").partitionBy("cluster").parquet(
        _os.path.join(path, "codes")
    )
    with open(_os.path.join(path, "quantizer.json"), "w") as f:
        _json.dump([[cl, cv] for cl, cv in cents], f)
    with open(_os.path.join(path, "codebooks.json"), "w") as f:
        _json.dump(books, f)


def ivf_pq_index_topk(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 100_000,
) -> DataFrame:
    """Query a persisted IVF-PQ index: pick each query's ``nprobe``
    nearest coarse centroids (map-only against the JSON quantizer),
    scan ONLY those list partitions — and only their CODE columns —
    then ADC-rank the candidates with per-query distance tables.
    Per-query cost: nprobe/n_clusters of the rows × m byte-lookups.

    The query side is collected once to the driver (probe lists +
    distance tables), capped at ``max_queries`` with a loud error —
    same contract as pq_adc_topk."""
    import json as _json
    import os as _os

    with open(_os.path.join(path, "quantizer.json")) as f:
        cents = [(int(cl), [float(x) for x in cv]) for cl, cv in _json.load(f)]
    with open(_os.path.join(path, "codebooks.json")) as f:
        books = [[[float(x) for x in c] for c in sub] for sub in _json.load(f)]

    cent_lit = F.lit([cv for _, cv in cents])
    ids_lit = F.lit([cl for cl, _ in cents])
    qn = queries.select(
        F.col(id_col), F.col(vec_col), normalized(F.col(vec_col)).alias("q_vec")
    )
    scored_cents = F.zip_with(
        F.transform(cent_lit, lambda c: dot(F.col("q_vec"), c)),
        ids_lit,
        lambda c, i: F.struct(c.alias("c"), i.alias("cl")),
    )
    probes = F.slice(F.reverse(F.array_sort(scored_cents)), 1, nprobe)
    qp = qn.withColumn("probe", F.transform(probes, lambda s: s["cl"]))
    # ONE capped collect feeds both the probe list and the per-query
    # distance tables (an unguarded double collect OOMs the driver on an
    # oversized query side instead of failing cleanly)
    qrows = (
        qp.select(F.col(id_col), F.col(vec_col), "probe")
        .limit(max_queries + 1)
        .collect()
    )
    if len(qrows) > max_queries:
        raise ValueError(
            f"ivf_pq_index_topk: query side exceeds max_queries={max_queries} "
            "rows; probe lists and ADC distance tables are driver-built by "
            "contract. Pass a smaller query set (or raise max_queries "
            "deliberately)."
        )
    probe_ids = sorted({cl for r in qrows for cl in r["probe"]})
    codes = (
        spark.read.parquet(_os.path.join(path, "codes"))
        .filter(F.col("cluster").isin(probe_ids))
        .select(F.col(id_col), "codes", "cluster")
    )
    # per-query candidate set = its probed clusters only; reuse the ADC
    # kernel per probe-restricted pair via an explicit cluster join
    q_clusters = qp.select(
        F.col(id_col), F.col(vec_col), F.explode("probe").alias("cluster")
    )
    pairs = q_clusters.alias("q").join(
        codes.alias("c"), "cluster"
    ).filter(F.col(f"q.{id_col}") != F.col(f"c.{id_col}"))
    m = len(books)
    dsub = len(books[0][0])

    def dtable(vec):
        out = []
        for s in range(m):
            sub = vec[s * dsub : (s + 1) * dsub]
            row = []
            for c in books[s]:
                acc = 0.0
                for x, y in zip(sub, c):
                    d = float(x) - y
                    acc += d * d
                row.append(acc)
            out.append(row)
        return out

    dt = F.broadcast(
        spark.createDataFrame(
            [(int(r[0]), dtable(list(r[1]))) for r in qrows],
            f"{id_col} long, dtab array<array<double>>",
        ).withColumnRenamed(id_col, "q_id")
    )
    cand = pairs.select(
        F.col(f"q.{id_col}").alias("q_id"),
        F.col(f"c.{id_col}").alias("c_id"),
        F.col("c.codes").alias("codes"),
    ).join(dt, "q_id")
    contrib = F.zip_with(
        F.col("dtab"), F.col("codes"), lambda row, c: F.element_at(row, c + 1)
    )
    scored = (
        cand.select(
            "q_id", "c_id",
            F.aggregate(contrib, F.lit(0.0), lambda a, x: a + x).alias("adist"),
        )
        .groupBy("q_id", "c_id")
        .agg(F.min("adist").alias("adist"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adist").asc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", F.round("adist", 6).alias("adist"), "rank")
    )


def pq_encode_np(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Vectorized PQ encoding — the production kernel for the
    expression-path ``pq_encode``: each Arrow batch encodes with one
    BLAS matmul per subspace (``argmin ‖x−c‖² = argmin ‖c‖²−2x·cᵀ``),
    ~10-100× the per-row throughput of interpreted expression folds.
    Same argmin semantics (ties toward the lowest code via numpy's
    first-minimum); distances computed in float64 so code assignments
    match the expression path except on exact centroid-distance ties.
    """
    import numpy as np
    import pandas as pd

    m = len(codebooks)
    dsub = len(codebooks[0][0])
    C = [np.asarray(codebooks[s], dtype=np.float64) for s in range(m)]
    Cn = [(c * c).sum(axis=1) for c in C]

    def encode(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            codes = np.empty((X.shape[0], m), dtype=np.int64)
            for s in range(m):
                Xs = X[:, s * dsub : (s + 1) * dsub]
                # ||c||^2 - 2 x.c — ||x||^2 is constant per row for argmin
                D = Cn[s][None, :] - 2.0 * (Xs @ C[s].T)
                codes[:, s] = D.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    return corpus.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        encode, f"{id_col} long, codes array<long>"
    )
