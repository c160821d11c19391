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

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints under `from __future__ import annotations`

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..sources import fan_out


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
    d = fan_out(data).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__dvec")
    )
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
    H56(seed:j) scaled to [-1, 1]. Reproducible across runs/engines.

    The components are computed DRIVER-SIDE (one md5 per component,
    once per plan) and emitted as a literal array — evaluating the md5
    chain inside a per-row expression costs dim × n_planes × n_tables
    md5 calls per ROW (~2048 at the defaults), which benchmarked as the
    entire cost of the LSH stage."""
    import hashlib

    comps = [
        int(hashlib.md5(f"hp{seed}:{j}".encode()).hexdigest()[:14], 16) / float(2**55)
        - 1.0
        for j in range(dim)
    ]
    return F.array(*[F.lit(c) for c in comps])


def signbits_col(vec: Column, n_planes: int, dim: int) -> Column:
    """Random-hyperplane sign bucket (SimHash for vectors): bit i =
    sign(vec · hyperplane_i). Map-side only."""
    bucket = None
    for i in range(n_planes):
        bit = F.when(dot(vec, _hyperplane(i, dim)) > 0, F.lit(2**i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("long")


def _hyperplane_matrix(n_planes: int, dim: int, n_tables: int):
    """(dim × n_planes·n_tables) numpy matrix of the deterministic
    hyperplanes — same md5-derived components as ``_hyperplane``."""
    import hashlib

    import numpy as np

    total = n_planes * n_tables
    mat = np.empty((dim, total), dtype=np.float64)
    for s in range(total):
        for j in range(dim):
            mat[j, s] = (
                int(hashlib.md5(f"hp{s}:{j}".encode()).hexdigest()[:14], 16)
                / float(2**55)
                - 1.0
            )
    return mat


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
    Σ per-bucket-pairs ≪ n². The scale path for cosine_neardup_pairs.

    Physical shape: the n_planes·n_tables sign bits come from ONE
    Arrow-batched pandas_udf doing a (batch × dim) @ (dim × planes)
    BLAS matmul — per-row higher-order array expressions for 32 dot
    products benchmarked ~6× slower. Candidates equi-join on
    (table_id, bucket); the exact-cosine verify is a second vectorized
    pandas_udf over only the candidate pairs."""
    from pyspark.sql.functions import pandas_udf

    planes = _hyperplane_matrix(n_planes, dim, n_tables)

    @pandas_udf("array<long>")
    def bucket_ids(vecs: pd.Series) -> pd.Series:
        import numpy as np

        m = np.stack(vecs.to_numpy()).astype(np.float64)  # (batch, dim)
        signs = (m @ planes) > 0  # (batch, planes*tables)
        weights = np.tile(2 ** np.arange(n_planes, dtype=np.int64), n_tables)
        b = (signs * weights).reshape(len(m), n_tables, n_planes).sum(axis=2)
        return pd.Series(list(b))

    @pandas_udf("double")
    def cos_pd(va: pd.Series, vb: pd.Series) -> pd.Series:
        import numpy as np

        a = np.stack(va.to_numpy()).astype(np.float64)
        b = np.stack(vb.to_numpy()).astype(np.float64)
        num = (a * b).sum(axis=1)
        den = np.sqrt((a * a).sum(axis=1)) * np.sqrt((b * b).sum(axis=1))
        return pd.Series(num / den)

    bucketed = fan_out(df).select(
        F.col(id_col),
        F.col(vec_col).alias("__v"),
        F.posexplode(bucket_ids(F.col(vec_col))).alias("table_id", "bucket"),
    )
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
        cand.withColumn("cos_sim", F.round(cos_pd(F.col("__va"), F.col("__vb")), round_to))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Symmetric int8 scalar quantization: per-vector scale =
    127 / max|x| (1.0 for the zero vector), q_i = round(x_i × scale) ∈
    [-127, 127] — the standard 4× storage/bandwidth lever for an
    embedding corpus (float32 → int8), with the scale kept per vector
    so reconstruction is q_i / scale.

    Output: (id, scale, qvec array<int>, mae) where mae is the mean
    absolute reconstruction error — the quality audit a pipeline
    monitors when deciding whether int8 recall is acceptable.

    Map-side only, zero shuffle. The scale is materialized as a column
    BEFORE the quantization lambda (an embedded expression would
    re-reduce the array per element — see the lambda-CSE rule in
    operators/quality.py). All math in doubles with HALF_UP rounding,
    reproduced exactly by the DuckDB oracle."""
    base = (
        df.select(
            F.col(id_col),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
        )
        .withColumn(
            "__amax", F.array_max(F.transform("__v", lambda x: F.abs(x)))
        )
        .withColumn(
            "scale",
            F.when(F.col("__amax") > 0, F.lit(127.0) / F.col("__amax")).otherwise(
                F.lit(1.0)
            ),
        )
        .withColumn(
            "qvec",
            F.transform(
                "__v", lambda x: F.round(x * F.col("scale")).cast("int")
            ),
        )
    )
    n = F.size("__v")
    err = F.aggregate(
        F.zip_with(
            "__v", "qvec", lambda x, q: F.abs(x - q.cast("double") / F.col("scale"))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return base.select(
        id_col,
        F.round("scale", round_to).alias("scale"),
        "qvec",
        F.round(err / n, round_to).alias("mae"),
    )


def kmeans_centroids(
    data: DataFrame,
    k: int = 4,
    max_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Deterministic Lloyd's k-means over an embedding column,
    DataFrame-native — the principled trainer for ``ivf_topk``'s
    centroids (init matches its contract: the k lowest-id vectors, each
    centroid keyed by its source vector id).

    Output: one row per (cent_id, pos, value) — the trained centroid
    components — plus the cluster population via ``n_members``.

    Scale per iteration: assignment broadcast-crossJoins the k-row
    centroid frame against the corpus (map-side ×k expansion, corpus
    never shuffles) and keeps each vector's nearest centroid; the
    update posexplodes assigned vectors to (cluster, dim, value) and
    averages — a map-side-combinable agg whose shuffle carries
    k × dim partial sums per map partition, nothing proportional to
    the corpus. Ranks truncate lineage with an eager localCheckpoint
    per iteration (same pattern as graph.pagerank).

    Cross-engine determinism: all math in doubles; distances round to
    ``round_to`` BEFORE the argmin with cent_id as tiebreak, and
    centroid components round each iteration — so the DuckDB oracle
    (unrolled CTE chain) reproduces every assignment bit-for-bit.

    A cluster whose membership empties mid-training keeps its previous
    centroid (carried forward via left join), so k centroids in always
    means k centroids out — ``n_members`` reports 0 for such a row."""
    cents, assigned = _kmeans_fit(data, k, max_iter, id_col, vec_col, round_to)
    members = assigned.groupBy("cent_id").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        cents.join(members, "cent_id", "left")
        .withColumn("n_members", F.coalesce("n_members", F.lit(0)))
        .select("cent_id", "n_members", F.posexplode("cvec").alias("pos", "value"))
        .select("cent_id", "pos", "value", "n_members")
    )


def kmeans_fit(
    data: DataFrame,
    k: int = 4,
    max_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Trained centroids as (cent_id, cent_vec array<double>) — the
    form ``ivf_topk(..., centroids=...)`` and ``kmeans_assign``
    consume, closing the train-then-index/shard loop."""
    cents, _ = _kmeans_fit(data, k, max_iter, id_col, vec_col, round_to)
    return cents.select("cent_id", F.col("cvec").alias("cent_vec"))


def kmeans_assign(
    data: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """(id, cent_id, dist): nearest trained centroid per vector — the
    semantic-sharding primitive (cluster-balanced sampling, per-cluster
    quotas, write-time clustering for IVF partition pruning).

    One broadcast crossJoin of the k-row centroid frame against the
    corpus + a per-vector argmin expressed as a min-struct AGGREGATE
    (``min(struct(dist, cent_id))``), not a window: partial aggregation
    collapses the k candidate rows per vector map-side, so the exchange
    carries one row per vector instead of the k-expanded corpus. Same
    determinism contract as the trainer (round-``round_to`` squared-L2,
    cent_id tiebreak via struct field ordering)."""
    vecs = data.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    )
    cents = centroids.select("cent_id", F.col("cent_vec").alias("cvec"))
    sqdist = F.round(
        F.aggregate(
            F.zip_with("vec", "cvec", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        round_to,
    )
    return (
        vecs.crossJoin(F.broadcast(cents))
        .withColumn("dist", sqdist)
        .groupBy(id_col)
        .agg(F.min(F.struct("dist", "cent_id")).alias("__best"))
        .select(
            id_col,
            F.col("__best.cent_id").alias("cent_id"),
            F.col("__best.dist").alias("dist"),
        )
    )


def _kmeans_fit(
    data: DataFrame,
    k: int,
    max_iter: int,
    id_col: str,
    vec_col: str,
    round_to: int,
):
    vecs = data.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    )
    cents = (
        vecs.orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cent_id"), F.col("vec").alias("cvec"))
    )
    sqdist = F.round(
        F.aggregate(
            F.zip_with("vec", "cvec", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        round_to,
    )
    # argmin as min(struct(dist, cent_id, vec)) rather than a
    # row_number window: the window would exchange the k-expanded
    # corpus (corpus x k rows) every iteration, while the aggregate's
    # partial (map-side) combine collapses the k candidates per vector
    # before the shuffle. cent_id is never reached as a tiebreak unless
    # two rounded dists are equal, and vec is constant per vec_id, so
    # the struct ordering reproduces the window's (dist, cent_id) sort.
    for _ in range(max_iter):
        assigned = (
            vecs.crossJoin(F.broadcast(cents))
            .withColumn("dist", sqdist)
            .groupBy("vec_id")
            .agg(F.min(F.struct("dist", "cent_id", "vec")).alias("__best"))
            .select(
                "vec_id",
                F.col("__best.cent_id").alias("cent_id"),
                F.col("__best.vec").alias("vec"),
            )
        )
        updated = (
            assigned.select("cent_id", F.posexplode("vec").alias("pos", "val"))
            .groupBy("cent_id", "pos")
            .agg(F.round(F.avg("val"), round_to).alias("val"))
            .groupBy("cent_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "val"))),
                    lambda s: s["val"],
                ).alias("cvec")
            )
        )
        # A cluster whose membership empties keeps its previous centroid
        # (left join onto the prior k-row frame) so kmeans_fit(k=N)
        # always returns N centroids — the update would otherwise drop
        # the row and silently shrink every downstream IVF/assign list.
        cents = (
            cents.select("cent_id", F.col("cvec").alias("__prev"))
            .join(updated, "cent_id", "left")
            .select("cent_id", F.coalesce("cvec", "__prev").alias("cvec"))
            .localCheckpoint(eager=True)
        )
    return cents, assigned


def ivf_topk(
    data: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: deterministic centroids (the nlist
    lowest-id vectors — a fixed, reproducible 'training'), assign every
    vector to its nearest centroid, probe the nprobe nearest lists per
    query. Scanned fraction ≈ nprobe/nlist.

    Pass ``centroids`` (cent_id, cent_vec — e.g. ``kmeans_fit``'s
    output) to index against TRAINED lists instead of the naive init;
    balanced lists tighten the scanned-fraction/recall trade.

    At cluster scale the assignment partitions the data by list id
    (write-time clustering); queries then prune partitions — the
    parquet-partition analog of a vector index.
    """
    if centroids is None:
        centroids = (
            data.orderBy(id_col)
            .limit(nlist)
            .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec"))
        )
    cent_rows = centroids.select("cent_id", "cent_vec").collect()  # nlist rows — tiny, deliberate
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

    assigned = fan_out(data).select(
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
