"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; LSH-bucketed and
IVF variants as the approximate scale path.

Scale design: dot products are JVM array expressions
(``zip_with`` + ``aggregate``) — no Python, no explode. The query side
of a top-k search is small by construction and broadcast; brute force
is then a map-side cross of every data partition with the broadcast
queries followed by a per-query top-k (one shuffle on query id).
IVF cuts the scanned fraction to ~1/nlist per probe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import h56


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    data: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest data
    vectors (excluding itself). Deterministic ranking: rounded cosine
    desc, then neighbor id asc — engine-stable even at float-precision
    ties.

    The queries side is broadcast (small by construction); the heavy
    side streams map-side.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    d = data.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__dvec"))
    scored = (
        d.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("__qvec"), F.col("__dvec")), round_to))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-dup).

    Exact all-pairs is O(n²) — correct at oracle scale; at 100 TB use
    ``lsh_bucketed_neardup_pairs`` (random-hyperplane buckets) so only
    within-bucket pairs are scored.
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cosine(F.col("__va"), F.col("__vb")), round_to))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def _hyperplane(seed: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane: component j is
    H56(seed:j) scaled to [-1, 1]. Reproducible across runs/engines."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            h56(F.concat(F.lit(f"hp{seed}:"), j.cast("string"))) / F.lit(float(2**55))
        )
        - F.lit(1.0),
    )


def signbits_col(vec: Column, n_planes: int, dim: int) -> Column:
    """Random-hyperplane sign bucket (SimHash for vectors): bit i =
    sign(vec · hyperplane_i). Map-side only."""
    bucket = None
    for i in range(n_planes):
        bit = F.when(dot(vec, _hyperplane(i, dim)) > 0, F.lit(2**i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("long")


def lsh_bucketed_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 4,
    round_to: int = 4,
) -> DataFrame:
    """Approximate near-dup: random-hyperplane LSH buckets (n_tables
    independent tables), score only within-bucket pairs, verify with
    exact cosine. Recall grows with n_tables; cost is
    Σ per-bucket-pairs ≪ n². The scale path for cosine_neardup_pairs."""
    vec = F.col(vec_col)
    # one signature per table: offset the hyperplane seeds per table
    buckets = []
    for t in range(n_tables):
        b = None
        for i in range(n_planes):
            bit = F.when(
                dot(vec, _hyperplane(t * n_planes + i, dim)) > 0, F.lit(2**i)
            ).otherwise(F.lit(0))
            b = bit if b is None else b + bit
        buckets.append(F.struct(F.lit(t).alias("table_id"), b.cast("long").alias("bucket")))
    bucketed = df.select(
        F.col(id_col), vec.alias("__v"), F.explode(F.array(*buckets)).alias("tb")
    ).select(id_col, "__v", "tb.table_id", "tb.bucket")
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.__v").alias("__va"),
            F.col("b.__v").alias("__vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("cos_sim", F.round(cosine(F.col("__va"), F.col("__vb")), round_to))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def ivf_topk(
    data: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """IVF approximate top-k: deterministic centroids (the nlist
    lowest-id vectors — a fixed, reproducible 'training'), assign every
    vector to its nearest centroid, probe the nprobe nearest lists per
    query. Scanned fraction ≈ nprobe/nlist.

    At cluster scale the assignment partitions the data by list id
    (write-time clustering); queries then prune partitions — the
    parquet-partition analog of a vector index.
    """
    cents = (
        data.orderBy(id_col)
        .limit(nlist)
        .select(
            F.monotonically_increasing_id().alias("__tmp"),
            F.col(id_col).alias("cent_id"),
            F.col(vec_col).alias("cent_vec"),
        )
        .drop("__tmp")
    )
    cent_rows = cents.collect()  # nlist rows — tiny, deliberate
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(r["cent_id"]).alias("cent_id"),
                F.array(*[F.lit(float(x)) for x in r["cent_vec"]]).alias("cvec"),
            )
            for r in cent_rows
        ]
    )

    def nearest_lists(vec: Column, n: int) -> Column:
        scored = F.transform(
            cent_arr,
            lambda c: F.struct(
                F.round(cosine(vec, c["cvec"]), 6).alias("sim"), c["cent_id"].alias("cent_id")
            ),
        )
        return F.slice(F.reverse(F.array_sort(scored)), 1, n)

    assigned = data.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__dvec"),
        nearest_lists(F.col(vec_col), 1)[0]["cent_id"].alias("list_id"),
    )
    probes = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        F.explode(F.transform(nearest_lists(F.col(vec_col), nprobe), lambda s: s["cent_id"])).alias(
            "list_id"
        ),
    )
    scored = (
        assigned.join(F.broadcast(probes), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("__qvec"), F.col("__dvec")), round_to))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
