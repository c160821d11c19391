"""Skew-handling tooling for large joins.

AQE's skew-join splitting covers sort-merge joins automatically; these
helpers cover the cases AQE can't: aggregations over skewed keys
(two-phase salted aggregation) and explicit salting when one side of a
join must be replicated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over
    ``salt_buckets`` partitions: left rows get a random-ish salt
    (deterministic: hash of the full row), the right side is replicated
    ``salt_buckets`` times. Use when the LEFT side has hot keys and the
    right side is small enough to replicate (but too big / ineligible
    to broadcast).

    Cost model: right side ×salt_buckets vs eliminating the straggler
    task holding the hot key — worth it when key frequency skew is
    ≫ salt_buckets.
    """
    lsalt = left.withColumn(
        "__salt",
        F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salt_buckets)),
    )
    rsalt = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return lsalt.join(rsalt, [on, "__salt"], how).drop("__salt")


def salted_count(
    df: DataFrame, key: str, salt_buckets: int = 32
) -> DataFrame:
    """Two-phase count per key for heavily skewed keys: partial count
    per (key, salt), then final sum per key. Identical result to a
    plain groupBy-count; the first shuffle spreads a hot key over
    ``salt_buckets`` reducers instead of one straggler.

    (Plain count/sum/min/max already partial-aggregate map-side, so
    this matters when upstream partitioning concentrates a hot key —
    e.g. right after an explode of a few huge documents.)
    """
    return (
        df.withColumn("__salt", F.pmod(F.hash(F.rand(seed=42)), F.lit(salt_buckets)))
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
        .groupBy(key)
        .agg(F.sum("__partial").cast("long").alias("cnt"))
    )


def key_skew_report(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Diagnose skew: top-N keys by frequency with their share of all
    rows — the 'should I salt this join?' report."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("t")).collect()[0]["t"] or 1
    return (
        counts.orderBy(F.col("cnt").desc(), F.col(key))
        .limit(top)
        .withColumn("share", F.round(F.col("cnt") / F.lit(float(total)), 6))
    )


def mg_heavy_hitters(
    df: DataFrame,
    key: str,
    k: int = 10,
) -> DataFrame:
    """Misra-Gries heavy-hitters sketch: a bounded ``k``-counter
    summary of the key-frequency distribution, the mergeable-summary
    alternative to an exact groupBy when only the heavy keys matter
    (hot-key detection feeding ``salted_join``, trending-item feeds).
    GUARANTEES (Misra-Gries 1982; merge bound Agarwal et al. 2012,
    "Mergeable Summaries"): every key with true frequency > N/(k+1)
    is present, and every reported count satisfies
    true − N/(k+1) <= reported <= true — the bound survives ANY merge
    tree, so the per-partition-then-merge plan below inherits it.

    Output: (key, mg_count) — at most k rows.

    Scale: one Arrow-batched ``mapInPandas`` pass builds a k-counter
    summary per partition (bounded state, no shuffle of the data);
    only partitions × k (summary) rows leave the map side and are
    merged with the same algorithm. The summary content (not the
    guarantee) depends on partitioning — treat reported counts as
    lower bounds, which is what the verdict oracle checks."""
    if int(k) < 1:
        raise ValueError(f"mg_heavy_hitters: k must be >= 1 (got {k})")

    def mg_update(counters: dict, key_val, inc: int, cap: int):
        if key_val in counters:
            counters[key_val] += inc
        elif len(counters) < cap:
            counters[key_val] = inc
        else:
            # decrement-all by the min survivor logic, generalized for
            # weighted increments (merge feeds weights > 1)
            dec = min(inc, min(counters.values()))
            for c in list(counters):
                counters[c] -= dec
                if counters[c] == 0:
                    del counters[c]
            rem = inc - dec
            if rem > 0:
                if key_val in counters:
                    counters[key_val] += rem
                elif len(counters) < cap:
                    counters[key_val] = rem

    def partial(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for v in pdf[key]:
                if v is None:
                    continue
                mg_update(counters, v, 1, int(k))
        if counters:
            yield pd.DataFrame(
                {key: list(counters), "mg_count": list(counters.values())}
            )

    base = df.select(key).filter(F.col(key).isNotNull())
    schema = f"{key} {base.schema[key].dataType.simpleString()}, mg_count long"
    partials = base.mapInPandas(partial, schema)
    # summaries are partitions x k rows — driver merge is the same
    # algorithm over weighted entries, deterministic given the rows
    rows = partials.collect()
    merged: dict = {}
    for r in sorted(rows, key=lambda r: (str(r[key]), -r["mg_count"])):
        mg_update(merged, r[key], int(r["mg_count"]), int(k))
    spark = df.sparkSession
    out = [(v, int(c)) for v, c in sorted(merged.items(), key=lambda t: str(t[0]))]
    return spark.createDataFrame(
        out or [(None, 0)][:0], schema
    )


def quantile_summary(
    df: DataFrame,
    col: str,
    quantiles: list[float],
    k: int = 64,
) -> DataFrame:
    """Mergeable rank-sketch quantile estimates: each partition sorts
    its values once and keeps every ceil(n/k)-th element (chunk max)
    with the chunk size as its weight, so a summary row at cumulative
    weight W has true within-partition rank in [W, W + g) — merging
    the partitions' summaries by value therefore bounds the GLOBAL
    rank error of any estimate by Σ g_p < N/k + P (partitions). The
    q-quantile estimate is the first merged value whose cumulative
    weight reaches q·N. The deterministic, no-randomness sibling of
    GK/KLL: the ESTIMATE depends on partitioning, the BOUND does not
    (same contract style as ``mg_heavy_hitters``).

    Output: (q, estimate, n_total) — one row per requested quantile.

    Scale: one Arrow-batched ``mapInPandas`` pass (per-partition sort
    of its own slice — no shuffle); only partitions × k summary rows
    reach the driver merge."""
    if int(k) < 1:
        raise ValueError(f"quantile_summary: k must be >= 1 (got {k})")
    for q in quantiles:
        if not (0.0 < float(q) < 1.0):
            raise ValueError(f"quantile_summary: q must be in (0,1) (got {q})")

    def partial(batches):
        import numpy as np
        import pandas as pd

        vals = []
        for pdf in batches:
            v = pdf[col].dropna().to_numpy()
            if len(v):
                vals.append(v)
        if not vals:
            return
        arr = np.sort(np.concatenate(vals))
        n = len(arr)
        g = -(-n // int(k))  # ceil
        rows_v, rows_w = [], []
        for start in range(0, n, g):
            chunk = arr[start : start + g]
            rows_v.append(float(chunk[-1]))
            rows_w.append(int(len(chunk)))
        yield pd.DataFrame({"v": rows_v, "w": rows_w})

    partials = (
        df.select(F.col(col).cast("double").alias(col))
        .filter(F.col(col).isNotNull())
        .mapInPandas(partial, "v double, w long")
        .collect()
    )
    merged = sorted((r["v"], r["w"]) for r in partials)
    n_total = sum(w for _, w in merged)
    out = []
    for q in quantiles:
        target = float(q) * n_total
        cum = 0
        est = merged[-1][0] if merged else None
        for v, w in merged:
            cum += w
            if cum >= target:
                est = v
                break
        out.append((float(q), est, int(n_total)))
    spark = df.sparkSession
    return spark.createDataFrame(out, "q double, estimate double, n_total long")


def cms_counts(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """COUNT-MIN SKETCH point estimates next to exact truth — the
    sketch every streaming counter ships (Cormode-Muthukrishnan 2005):
    ``depth`` hash rows of ``width`` buckets each; a value's estimate
    is the MIN of its bucket counts, always >= the true count with the
    overestimate bounded by collisions. Emitting estimate AND exact
    side by side makes the sketch's error auditably visible (and the
    whole operator SQL-oracle checkable — H56 hashing is
    engine-identical).

    Output: (value, exact, estimate, overestimate) per distinct value.

    Scale: the sketch build is one (depth × width)-keyed map-side-
    combined aggregation (BOUNDED: depth·width cells regardless of
    data volume — the point of a sketch); the estimate lookup
    broadcast-joins the cell table back to the distinct-value frame."""
    from .text import h56

    dd, ww = int(depth), int(width)
    if dd < 1 or ww < 1:
        raise ValueError(f"cms_counts: need depth/width >= 1 (got {dd}/{ww})")
    v = F.col(col).cast("string")
    rows = df.select(v.alias("__v")).filter(F.col("__v").isNotNull())
    hashed = rows.select(
        "__v", F.explode(F.sequence(F.lit(0), F.lit(dd - 1))).alias("__d")
    ).withColumn(
        "__b",
        h56(F.concat(F.col("__d").cast("string"), F.lit("|"), F.col("__v")))
        % ww,
    )
    cells = hashed.groupBy("__d", "__b").agg(F.count(F.lit(1)).alias("__c"))
    exact = rows.groupBy(F.col("__v").alias("value")).agg(
        F.count(F.lit(1)).alias("exact")
    )
    lookups = exact.select(
        "value", F.explode(F.sequence(F.lit(0), F.lit(dd - 1))).alias("__d")
    ).withColumn(
        "__b",
        h56(F.concat(F.col("__d").cast("string"), F.lit("|"), F.col("value")))
        % ww,
    )
    est = (
        lookups.join(F.broadcast(cells), ["__d", "__b"])
        .groupBy("value")
        .agg(F.min("__c").alias("estimate"))
    )
    return exact.join(est, "value").select(
        "value",
        "exact",
        "estimate",
        (F.col("estimate") - F.col("exact")).alias("overestimate"),
    )


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_bits: int = 1024,
    n_hashes: int = 3,
    scale: bool = False,
) -> DataFrame:
    """BLOOM-FILTER PRE-JOIN — the shuffle-avoidance pattern that
    matters most at 100 TB: build an ``n_bits`` filter from the dim
    side's keys and pass only fact rows whose ``n_hashes`` H56
    positions are ALL set. False positives possible (deterministically
    — same hashes on both engines), false negatives never: the exact
    semi-join over the survivors stays exact while the full fact table
    never shuffles on a key that mostly misses. The probe is a PURE
    MAP-SIDE filter — no explode, no join, no aggregation; duplicate
    fact rows keep their multiplicity.

    Two bit-identical probe mechanisms (same build, same packed words,
    same hash positions, same survivors):

    - ``scale=False`` (default, the ORACLE TWIN): the packed words are
      embedded as a LITERAL long-array in the plan, and the bit test
      is integer arithmetic — (wval // 2^bit) % 2 — that a SQL oracle
      replays verbatim. The literal array puts a practical CEILING on
      ``n_bits``: every task ships n_bits/32 literals inside the
      serialized plan, so keep n_bits <= ~2^16 (a few KB). Good for
      small dims and for oracle certification, wrong for a 1 M-key
      dim whose 10 M-bit filter would embed megabytes of literals in
      every plan broadcast.
    - ``scale=True`` (the PRODUCTION PROBE): the packed words travel
      once per executor as a SparkContext broadcast variable (numpy
      int64 array, n_bits/32 * 8 bytes) and the probe runs inside an
      Arrow ``mapInPandas`` stage. The ``n_hashes`` bit POSITIONS are
      computed JVM-side (the same whole-stage-codegen md5/conv
      arithmetic as the literal path — ``pos_expr``) so the Python
      stage is a pure vectorized numpy bitmap lookup
      ``(words[pos >> 5] >> (pos & 31)) & 1`` with zero per-row Python
      hashing. At ~10 bits/key a 100 M-key dim is a 125 MB broadcast —
      executor memory, never plan bytes.

    Words pack 32 bits/long via exact power-of-two sums (the
    ``binarize_embeddings`` convention — no sign-bit wraparound).

    Output: the fact rows passing the filter plus a ``bloom_pass``
    marker column.

    Scale: the filter build is one bounded aggregation over dim keys
    plus an n_bits/32-row collect; sized for dimension-sided inputs
    (n_bits grows with the dim key count, not the fact side)."""
    from functools import reduce as _reduce
    from operator import and_ as _and

    from .text import h56

    nb, nh = int(n_bits), int(n_hashes)
    if nb < 32 or nb % 32 != 0 or nh < 1:
        raise ValueError(
            f"bloom_semi_join: n_bits must be a positive multiple of 32 "
            f"and n_hashes >= 1 (got {nb}/{nh})"
        )

    def pos_expr(j: int, key) -> F.Column:
        return (
            h56(F.concat(F.lit(f"{j}|"), key.cast("string"))) % nb
        )

    dim_keys = (
        dim.select(F.col(dim_key).alias("__k"))
        .filter(F.col("__k").isNotNull())
        .distinct()
    )
    # ONE pass over the dim keys: all n_hashes positions as an exploded
    # array (previously n_hashes separate union legs re-reading the
    # keys), packed per word with bit_or — OR of 2^bit over all rows is
    # identical to the former distinct + sum of distinct powers, minus
    # one dedup shuffle.
    bits = dim_keys.select(
        F.explode(
            F.array(*[pos_expr(j, F.col("__k")) for j in range(nh)])
        ).alias("__pos")
    )
    words_rows = (
        bits.select(
            (F.col("__pos") / 32).cast("long").alias("__w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("__pos") % 32).cast("int")
            ).alias("__b"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__b").alias("__wval"))
        .collect()
    )
    arr = [0] * (nb // 32)
    for r in words_rows:
        arr[int(r["__w"])] = int(r["__wval"])

    if scale:
        # the Arrow probe stage evaluates n_hashes md5/conv folds per
        # fact row and cannot be pushed below an exchange, so an
        # under-split local scan serializes it onto one core — fan_out
        # splits it (no-op at cluster scale). The literal path below is
        # a plain Filter that Catalyst pushes into the scan regardless,
        # so fanning it out buys nothing (measured neutral) and is
        # skipped.
        from ..sources import fan_out

        return _bloom_probe_broadcast(
            fan_out(fact), fact_key, arr, nb, nh, pos_expr
        )

    wvals = F.array(*[F.lit(int(x)).cast("long") for x in arr])
    key = F.col(fact_key)
    checks = []
    for j in range(nh):
        pos = pos_expr(j, key)
        wval = F.element_at(wvals, ((pos / 32).cast("long") + 1).cast("int"))
        bit = pos % 32
        checks.append(
            (
                F.floor(wval / F.pow(F.lit(2.0), bit)).cast("long") % 2
            )
            == 1
        )
    cond = key.isNotNull() & _reduce(_and, checks)
    return fact.filter(cond).withColumn("bloom_pass", F.lit(True))


def _bloom_probe_broadcast(
    fact: DataFrame, fact_key: str, arr: list[int], nb: int, nh: int, pos_expr
) -> DataFrame:
    """bloom_semi_join's scale probe: packed words as an executor-side
    broadcast variable, bit test per Arrow batch. Bit-identical to the
    literal-array probe BY CONSTRUCTION — the ``nh`` bit positions are
    computed with the SAME JVM ``pos_expr`` (md5/conv whole-stage
    codegen) the literal path uses; the Python stage is only the
    vectorized numpy bitmap lookup, no per-row hashing."""
    import numpy as np
    from pyspark.sql import types as T

    words_bc = fact.sparkSession.sparkContext.broadcast(
        np.asarray(arr, dtype=np.int64)
    )
    key = F.col(fact_key)
    # -1 marks a NULL key (never passes); valid positions are >= 0, so
    # the Python side needs no null handling and Arrow ships plain i64.
    pos_cols = [
        F.coalesce(pos_expr(j, key), F.lit(-1)).cast("long").alias(f"__p{j}")
        for j in range(nh)
    ]
    tagged = fact.select("*", *pos_cols)
    fact_cols = [f.name for f in fact.schema.fields]
    out_schema = T.StructType(
        list(fact.schema.fields)
        + [T.StructField("bloom_pass", T.BooleanType(), False)]
    )

    def probe(batches):
        words = words_bc.value
        pnames = [f"__p{j}" for j in range(nh)]
        for pdf in batches:
            keep = pdf[pnames[0]].to_numpy(dtype=np.int64) >= 0
            for name in pnames:
                if not keep.any():
                    break
                pos = pdf[name].to_numpy(dtype=np.int64)
                safe = np.where(keep, pos, 0)
                keep &= ((words[safe >> 5] >> (safe & 31)) & 1).astype(bool)
            res = pdf.loc[keep, fact_cols]
            res["bloom_pass"] = np.ones(len(res), dtype=bool)
            yield res

    return tagged.mapInPandas(probe, schema=out_schema)


def _hll_reg_rho(value_col: str, p: int):
    """(register, rho) expressions shared by the HLL family: register
    = h % 2^p; rho = trailing zeros of the top 56-p hash bits + 1 via
    an explicit power-of-two CASE ladder (no float log). Integer
    shift, NOT h/m: the float division would round h's 56 bits to a
    double's 53 before the floor, corrupting low bits of r."""
    from .text import h56

    max_rho = 56 - p + 1
    h = h56(F.col(value_col).cast("string"))
    r = F.shiftright(h, p)
    rho = F.lit(max_rho)
    for k in range(max_rho - 1, 0, -1):
        rho = F.when(
            (r % F.lit(1 << k)) == F.lit(1 << (k - 1)), F.lit(k)
        ).otherwise(rho)
    return h, rho


def hll_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    p: int = 6,
) -> DataFrame:
    """HYPERLOGLOG DISTINCT-COUNT AUDIT — estimate next to truth (the
    cms_counts philosophy): per group, the classic HLL register
    estimate of ``count(distinct value)`` beside the exact count and
    the relative error. This is the number that justifies replacing a
    100 TB exact-distinct shuffle with a sketch (Flajolet et al. 2007,
    the public HLL paper): registers are a BOUNDED m = 2^p-row frame
    per group no matter the corpus.

    Determinism (the reason not to just call approx_count_distinct —
    whose HLL++ register layout is engine-private): every step is
    engine-mirrorable integer arithmetic on the shared H56 hash.
    register = h % m; rho = (trailing zeros of h // m) + 1, computed
    by an explicit power-of-two CASE ladder (no float log); the
    harmonic denominator Σ 2^-M_j is carried as the EXACT integer
    numerator Σ 2^(maxM - M_j) over 2^maxM (order-free integer sum —
    a float Σ would round differently under Spark's vs DuckDB's
    nondeterministic aggregation order), absent registers contributing
    2^maxM each. The final estimate is ONE float expression,
    alpha·m² · 2^maxM / N, rounded at the end; alpha·m² is embedded as
    an identical Python-computed literal on both engines. No
    small-range/large-range corrections — the audit reports the raw
    estimator beside the exact truth, so the corrections' engine-
    specific ln/pow never enter the hash.

    Output: (group_col, exact_distinct, hll_estimate, n_zero_registers,
    rel_err), one row per group.

    Value stringification must be engine-identical before the hash —
    ints, strings, dates are safe; cast raw doubles to a fixed-scale
    decimal first (the table_checksum caveat applies here verbatim).

    Scale: one groupBy(group, register) max-agg (map-side combined,
    register frame bounded at groups × m), one bounded second agg, and
    the exact-distinct branch for the audit column (drop it and the
    sketch alone scales to any corpus)."""
    m = 1 << int(p)
    if not (1 <= int(p) <= 12):
        raise ValueError(f"hll_distinct: p must be in [1, 12] (got {p})")
    h, rho = _hll_reg_rho(value_col, int(p))
    vals = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).alias("v"),
        F.pmod(h, F.lit(m)).alias("__reg"),
        rho.alias("__rho"),
    ).filter(F.col("v").isNotNull())
    regs = vals.groupBy("g", "__reg").agg(F.max("__rho").alias("__m"))
    per_g = regs.groupBy("g").agg(
        F.max("__m").alias("__maxm"),
        F.count(F.lit(1)).alias("__present"),
    )
    # exact integer numerator: present registers contribute
    # 2^(maxM - M_j), absent ones 2^maxM each (M_j = 0)
    num = (
        regs.join(per_g, "g")
        .groupBy("g", "__maxm", "__present")
        .agg(
            F.sum(
                F.pow(F.lit(2.0), F.col("__maxm") - F.col("__m")).cast("long")
            ).alias("__num_present")
        )
        .select(
            "g",
            "__maxm",
            (F.lit(m) - F.col("__present")).alias("n_zero_registers"),
            (
                F.col("__num_present")
                + (F.lit(m) - F.col("__present"))
                * F.pow(F.lit(2.0), F.col("__maxm")).cast("long")
            ).alias("__num"),
        )
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    alpha_m2 = alpha * m * m  # embedded identically in the SQL oracle
    exact = df.filter(F.col(value_col).isNotNull()).groupBy(
        F.col(group_col).alias("g")
    ).agg(F.countDistinct(value_col).alias("exact_distinct"))
    est = F.round(
        F.lit(alpha_m2) * F.pow(F.lit(2.0), F.col("__maxm")) / F.col("__num"),
        6,
    )
    return (
        exact.join(num, "g")
        .select(
            F.col("g").alias(group_col),
            "exact_distinct",
            est.alias("hll_estimate"),
            "n_zero_registers",
            F.round(
                F.abs(est - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                6,
            ).alias("rel_err"),
        )
    )


def hll_union(
    df: DataFrame,
    group_col: str,
    value_col: str,
    p: int = 6,
) -> DataFrame:
    """HLL SKETCH MERGE — the property that makes sketches the 100 TB
    answer (Agarwal et al. 2012, "Mergeable Summaries"): per-group
    register tables built INDEPENDENTLY (per shard, per day, per
    source) merge into the union's sketch by a per-register MAX — no
    re-scan of the inputs — so "distinct users across all 365 daily
    shards" costs 365 bounded register frames, not a year-wide exact
    shuffle. This op demonstrates the merge next to the truth: the
    union estimate from merged registers, the exact union distinct,
    and the sum of per-group exact distincts (>= union; the gap is
    the cross-group overlap the merge deduplicates).

    Same engine-mirrorable estimator as ``hll_distinct`` (shared
    register/rho arithmetic, exact-integer harmonic numerator, one
    final float expression, no range corrections).

    Output: ONE row — (n_groups, exact_union, sum_group_exact,
    hll_union_estimate, n_zero_registers, rel_err).

    Scale: the merge input is groups × 2^p register rows (bounded,
    combines map-side); only the audit columns touch the data again —
    drop them and the union estimate never re-scans the corpus."""
    m = 1 << int(p)
    if not (1 <= int(p) <= 12):
        raise ValueError(f"hll_union: p must be in [1, 12] (got {p})")
    h, rho = _hll_reg_rho(value_col, int(p))
    vals = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).alias("v"),
        F.pmod(h, F.lit(m)).alias("__reg"),
        rho.alias("__rho"),
    ).filter(F.col("v").isNotNull() & F.col("g").isNotNull())
    # per-group sketches (what each shard would persist) ...
    regs = vals.groupBy("g", "__reg").agg(F.max("__rho").alias("__m"))
    # ... merged by per-register MAX: the union's sketch
    merged = regs.groupBy("__reg").agg(F.max("__m").alias("__m"))
    agg = merged.agg(
        F.max("__m").alias("__maxm"),
        F.count(F.lit(1)).alias("__present"),
    )
    num = (
        merged.crossJoin(F.broadcast(agg))
        .groupBy("__maxm", "__present")
        .agg(
            F.sum(
                F.pow(F.lit(2.0), F.col("__maxm") - F.col("__m")).cast("long")
            ).alias("__num_present")
        )
        .select(
            "__maxm",
            (F.lit(m) - F.col("__present")).alias("n_zero_registers"),
            (
                F.col("__num_present")
                + (F.lit(m) - F.col("__present"))
                * F.pow(F.lit(2.0), F.col("__maxm")).cast("long")
            ).alias("__num"),
        )
    )
    alpha_m2 = (0.7213 / (1.0 + 1.079 / m)) * m * m
    exact = vals.agg(
        F.count_distinct("g").alias("n_groups"),
        F.count_distinct("v").alias("exact_union"),
    )
    per_g = (
        vals.groupBy("g")
        .agg(F.count_distinct("v").alias("__d"))
        .agg(F.sum("__d").cast("long").alias("sum_group_exact"))
    )
    est = F.round(
        F.lit(alpha_m2) * F.pow(F.lit(2.0), F.col("__maxm")) / F.col("__num"),
        6,
    )
    return (
        exact.crossJoin(F.broadcast(per_g))
        .crossJoin(F.broadcast(num))
        .select(
            "n_groups",
            "exact_union",
            "sum_group_exact",
            est.alias("hll_union_estimate"),
            "n_zero_registers",
            F.round(
                F.abs(est - F.col("exact_union")) / F.col("exact_union"), 6
            ).alias("rel_err"),
        )
    )
