"""Column-level normalization primitives (SURVEY.md §2.8).

All JVM-side built-ins — no Python UDFs — so they stay inside
whole-stage codegen at any scale.

Parity targets in /root/reference:
  - flatten_string_arrays: graph_etl/context.py:122,225 (List[Utf8] -> '|' join)
  - strip_control_chars:   graph_etl/context.py:123,226 (CR/LF/backslash strip)
  - dedup_by_key:          graph_etl/context.py:124,227 (unique on subset)
  - coalesce remap:        graph_etl/pipeline.py:57-67 (fill_null + rename)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

ARRAY_JOIN_SEP = "|"
# Matches the reference regex '(\r|\n|\\)' — strips CR, LF and backslash
# from every string column before staging (graph_etl/context.py:123).
CONTROL_CHAR_RE = "[\\r\\n\\\\]"


def flatten_string_arrays(df: DataFrame, sep: str = ARRAY_JOIN_SEP) -> DataFrame:
    """Join every array<string> column into a sep-joined string (F1)."""
    exprs = []
    changed = False
    for f in df.schema.fields:
        if isinstance(f.dataType, T.ArrayType):
            col = F.col(f.name)
            if not isinstance(f.dataType.elementType, T.StringType):
                col = F.transform(col, lambda x: x.cast("string"))
            exprs.append(F.array_join(col, sep).alias(f.name))
            changed = True
        else:
            exprs.append(F.col(f.name))
    return df.select(*exprs) if changed else df


def strip_control_chars(df: DataFrame, pattern: str = CONTROL_CHAR_RE) -> DataFrame:
    """Strip CR/LF/backslash from every string column (F2)."""
    exprs = []
    changed = False
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StringType):
            exprs.append(F.regexp_replace(F.col(f.name), pattern, "").alias(f.name))
            changed = True
        else:
            exprs.append(F.col(f.name))
    return df.select(*exprs) if changed else df


def dedup_by_key(df: DataFrame, keys: list[str], deterministic: bool = True) -> DataFrame:
    """One row per key (A1).

    The reference keeps an order-dependent arbitrary survivor
    (polars ``unique(subset=...)``); Spark's ``dropDuplicates`` is also
    arbitrary but run-to-run unstable. ``deterministic=True`` (default)
    keeps the lexicographically-first row over all non-key columns so
    results are reproducible for oracle checks (SURVEY.md §7.4.1).

    Scale note: both forms are a single hash-shuffle on the key;
    deterministic mode adds a per-key sort, not an extra shuffle.
    """
    if not deterministic:
        return df.dropDuplicates(keys)
    others = [c for c in df.columns if c not in keys]
    if not others:
        return df.dropDuplicates(keys)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc_nulls_last() for c in others])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def coalesce_remap(
    edges: DataFrame,
    mapping: DataFrame,
    endpoint: str,
    keep_mapped_from: bool = True,
    mapped_from_col: str = "mapped_from",
) -> DataFrame:
    """J1 explicit-remap join (graph_etl/pipeline.py:57-67).

    Full-outer join ``edges.<endpoint> = mapping.old_value``;
    endpoint := coalesce(new_value, old endpoint). Unmatched mapping
    rows survive with a null opposite endpoint (filtered only at load
    by the P6 predicate). ``keep_mapped_from`` preserves the pre-map
    value in a ``mapped_from_col`` column (explicit remap does; auto-map
    J2 drops it — pipeline.py:106). Callers remapping BOTH endpoints of
    one frame must pass distinct ``mapped_from_col`` names — the
    reference's fixed polars rename has a latent duplicate-column
    collision there; raising keeps it from passing silently.

    Scale shape: Spark cannot broadcast a FULL OUTER join (it would
    force a two-sided shuffle of the whole edge set), so the outer
    semantics are decomposed into
      left-join(edges, mapping)  UNION  anti-join(mapping, edge keys),
    which is result-identical and lets AQE broadcast the small mapping
    side in BOTH joins -- the big edge table never shuffles. The anti
    side only ships the single pruned endpoint-key column.
    """
    if keep_mapped_from and mapped_from_col in edges.columns:
        raise ValueError(
            f"coalesce_remap: column {mapped_from_col!r} already exists; "
            "pass a distinct mapped_from_col (e.g. per endpoint)"
        )
    m = mapping.select(
        F.col("old_value").alias("__old"), F.col("new_value").alias("__new")
    )
    # ANSI-proofing: when the replacement value's type differs from the
    # endpoint's, coalesce would otherwise pick one side's type and hard-
    # fail the cast under ANSI mode (e.g. 'Customer#000000899' -> BIGINT).
    # String is the permissive common supertype the reference implies.
    endpoint_dt = edges.schema[endpoint].dataType
    new_dt = m.schema["__new"].dataType
    coalesce_cast = "string" if endpoint_dt != new_dt else None
    matched = edges.join(m, edges[endpoint].eqNullSafe(m["__old"]), "left")
    if coalesce_cast:
        new_endpoint = F.coalesce(
            F.col("__new").cast(coalesce_cast), F.col(endpoint).cast(coalesce_cast)
        )
    else:
        new_endpoint = F.coalesce(F.col("__new"), F.col(endpoint))
    out_cols: list[Column] = []
    for c in edges.columns:
        if c == endpoint:
            out_cols.append(new_endpoint.alias(endpoint))
            if keep_mapped_from:
                out_cols.append(F.col(endpoint).alias(mapped_from_col))
        else:
            out_cols.append(F.col(c))
    left_part = matched.select(*out_cols)

    # unmatched mapping rows survive with null edge columns (reference
    # outer semantics; dropped only at load by the P6 predicate)
    leftover = m.join(
        edges.select(F.col(endpoint).alias("__old")), "__old", "left_anti"
    )
    lo_cols: list[Column] = []
    for c in edges.columns:
        if c == endpoint:
            # same ANSI-proof cast as the matched side: without it the
            # unionByName would rely on implicit non-ANSI coercion when
            # new_value is the non-string side
            new_val = (
                F.col("__new").cast(coalesce_cast) if coalesce_cast else F.col("__new")
            )
            lo_cols.append(new_val.alias(endpoint))
            if keep_mapped_from:
                lo_cols.append(F.lit(None).alias(mapped_from_col))
        else:
            lo_cols.append(F.lit(None).alias(c))
    right_part = leftover.select(*lo_cols)
    return left_part.unionByName(right_part)


def non_empty_endpoints(df: DataFrame, start: str = "start", end: str = "end") -> DataFrame:
    """P6 DB-side predicate: both endpoints present and non-empty
    (graph_etl/neo4j_loader.py:282)."""
    return df.filter(
        F.col(start).isNotNull()
        & F.col(end).isNotNull()
        & (F.col(start).cast("string") != "")
        & (F.col(end).cast("string") != "")
    )


def upsert_by_key(
    current: DataFrame, updates: DataFrame, keys: list[str] | str = "id"
) -> DataFrame:
    """SCD-1 keyed merge: rows from ``updates`` REPLACE same-key rows
    in ``current``; unmatched rows pass through from either side — the
    incremental-refresh primitive for staged node tables (full
    re-stage is the reference's only refresh model; this gives the
    nightly-delta path).

    Deterministic: on a key collision the updates side always wins;
    duplicate keys WITHIN a side resolve by the ``dedup_by_key``
    contract (lexicographically-first over non-key columns), so the
    merged table is reproducible on any engine or partitioning.

    Scale: ONE hash shuffle on the key (union is free; the preference
    window rides the same partitioning as the dedup rank). No join —
    the union+window form replaces the full-outer-join+coalesce
    per-column rewrite and keeps every column untouched."""
    if isinstance(keys, str):
        keys = [keys]
    tagged = current.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1))
    )
    others = [c for c in tagged.columns if c not in keys and c != "__src"]
    w = Window.partitionBy(*keys).orderBy(
        F.col("__src").desc(),
        *[F.col(c).asc_nulls_last() for c in others],
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def scd2_history(
    changelog: DataFrame,
    keys: list[str] | str,
    ts_col: str,
    tracked: list[str] | str,
) -> DataFrame:
    """SCD TYPE-2 history from a change log: collapse consecutive
    rows whose ``tracked`` attributes did not change, then interval-ize
    each surviving state — the versioned-dimension complement to the
    SCD-1 ``upsert_by_key`` (current-state only) above.

    Output: key columns + tracked columns + (valid_from, valid_to,
    is_current) where valid_to is the NEXT state's valid_from (NULL on
    the open/current version) — the standard half-open [from, to)
    convention.

    Deterministic: rows sharing an exact (key, ts) collapse to the
    lexicographically-first tracked tuple (the ``dedup_by_key``
    contract), and change detection compares NULL-safely (``<=>``), so
    the history is reproducible on any engine or partitioning.

    Scale: every step (tie-dedup, lag change-compare, lead interval
    close) is a window over the SAME partitionBy(keys) — ONE hash
    shuffle on the key total; no joins, no self-union."""
    if isinstance(keys, str):
        keys = [keys]
    if isinstance(tracked, str):
        tracked = [tracked]
    # tie-dedup rides the SAME keys partitioning as the later windows:
    # with rows ordered (ts, tracked...) inside the key, a row is a
    # (key, ts) tie-duplicate iff the previous row has the same ts —
    # keeping exactly the lexicographically-first tracked tuple
    w_tie = Window.partitionBy(*keys).orderBy(
        ts_col, *[F.col(c).asc_nulls_last() for c in tracked]
    )
    w_seq = Window.partitionBy(*keys).orderBy(ts_col)
    changed = F.lit(False)
    for c in tracked:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w_seq))
    first_row = F.row_number().over(w_seq) == 1
    deduped = (
        changelog.select(*keys, ts_col, *tracked)
        .withColumn(
            "__tie", F.col(ts_col).eqNullSafe(F.lag(ts_col).over(w_tie))
        )
        .filter(~F.col("__tie"))
        .drop("__tie")
    )
    states = deduped.withColumn(
        "__chg", first_row | changed
    ).filter(F.col("__chg")).drop("__chg")
    return states.select(
        *keys,
        *tracked,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w_seq).alias("valid_to"),
        F.lead(ts_col).over(w_seq).isNull().alias("is_current"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str] | str,
) -> DataFrame:
    """Keyed diff of two table snapshots: one row per key that was
    ``added``, ``removed``, or ``changed`` between ``old`` and ``new``,
    with the sorted list of differing column names — the
    change-data-capture primitive that closes the refresh family
    (``upsert_by_key`` applies deltas, ``scd2_history`` versions them,
    this DETECTS them between full snapshots).

    Comparison is NULL-safe per column; unchanged keys are dropped
    (the output is delta-sized, not table-sized). Both inputs must
    share a schema. Duplicate keys within a side resolve by the
    ``dedup_by_key`` contract first, so the diff is deterministic.

    Output: key columns + change_type + changed_cols (empty array for
    added/removed rows).

    Scale: ONE full outer join on the key — at 100 TB both snapshots
    shuffle once on the same key (or not at all if both are bucketed
    by key on disk); the per-column compare is map-side expression
    work on the joined row."""
    if isinstance(keys, str):
        keys = [keys]
    others = [c for c in old.columns if c not in keys]
    if set(old.columns) != set(new.columns):
        raise ValueError("snapshot_diff requires identical schemas")
    o = dedup_by_key(old, keys).alias("o")
    n = dedup_by_key(new, keys).alias("n")
    cond = [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in keys]
    joined = o.join(n, cond, "full_outer")
    old_present = F.col(f"o.{keys[0]}").isNotNull()
    # presence must be judged on a key column of each side (a row of
    # all-NULL non-keys is still present)
    new_present = F.col(f"n.{keys[0]}").isNotNull()
    changed_cols = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")), F.lit(c)
                    )
                    for c in others
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    change_type = (
        F.when(~old_present, F.lit("added"))
        .when(~new_present, F.lit("removed"))
        .when(F.size(changed_cols) > 0, F.lit("changed"))
    )
    return (
        joined.select(
            *[
                F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k)
                for k in keys
            ],
            change_type.alias("change_type"),
            F.when(old_present & new_present, changed_cols)
            .otherwise(F.array().cast("array<string>"))
            .alias("changed_cols"),
        )
        .filter(F.col("change_type").isNotNull())
    )


def schema_diff(old: DataFrame, new: DataFrame) -> list[dict]:
    """Schema drift report between two frames (yesterday's staged
    table vs today's ingest): added / removed / type-changed columns
    as a list of dicts — the control-plane companion to
    ``snapshot_diff`` (which diffs DATA under an identical schema,
    and refuses otherwise).

    Driver-side metadata only — no jobs, no data movement."""
    o = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    n = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    report: list[dict] = []
    for c in sorted(set(o) | set(n)):
        if c not in n:
            report.append({"column": c, "change": "removed", "old_type": o[c]})
        elif c not in o:
            report.append({"column": c, "change": "added", "new_type": n[c]})
        elif o[c] != n[c]:
            report.append(
                {"column": c, "change": "type_changed",
                 "old_type": o[c], "new_type": n[c]}
            )
    return report


def apply_cdc(
    current: DataFrame,
    changes: DataFrame,
    keys: list[str] | str,
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Apply a CDC change stream (Debezium-style I/U/D rows) to a
    table: per key, the HIGHEST-sequence change wins — an insert or
    update replaces the current row, a delete removes it; keys
    untouched by the stream pass through. Completes the refresh
    family: ``upsert_by_key`` (no deletes) < ``apply_cdc`` (full CDC)
    with ``snapshot_diff`` producing exactly this op format from two
    snapshots.

    ``changes`` carries the table columns plus ``op`` in
    {'I','U','D'} and a monotonically increasing ``seq`` (log offset;
    ties resolve by the dedup contract on the payload, then on the op
    itself — 'D' sorts first, so a delete wins a full same-seq
    same-payload tie deterministically). Delete rows may carry NULL
    non-key columns.

    Scale: ONE hash shuffle on the key — union current (seq -inf) with
    the changes, take the max-seq row per key via the ranking window,
    drop rows whose winner is a delete. No join."""
    if isinstance(keys, str):
        keys = [keys]
    data_cols = [c for c in current.columns]
    cur = (
        current.withColumn("__op", F.lit("I"))
        .withColumn("__seq", F.lit(-1).cast("long"))
    )
    chg = changes.select(
        *data_cols,
        F.col(op_col).alias("__op"),
        F.col(seq_col).cast("long").alias("__seq"),
    )
    others = [c for c in data_cols if c not in keys]
    w = Window.partitionBy(*keys).orderBy(
        F.col("__seq").desc(),
        *[F.col(c).asc_nulls_last() for c in others],
        F.col("__op").asc(),
    )
    return (
        cur.unionByName(chg)
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("__op") != "D"))
        .select(*data_cols)
    )


def fk_integrity(
    relations: list[tuple],
) -> DataFrame:
    """Referential-integrity audit across tables: for each relation
    ``(name, child_df, fk_col, parent_df, pk_col)``, count child rows
    whose non-null foreign key has no match in the parent — the
    orphan check a warehouse runs before publishing a snapshot (and
    the one ``check_expectations`` can't express, being single-table).
    NULL foreign keys are reported separately (SQL three-valued
    semantics: a NULL fk is unmatched but not an orphan).

    Output: one row per relation —
    (relation, n_child, n_null_fk, n_orphans, orphan_pct) with
    orphan_pct = orphans / non-null children rounded to 6 dp.

    Scale: per relation one distinct-project of the parent key and
    one LEFT ANTI join shuffling on the key (broadcast when the
    parent is dimension-sized — AQE decides); counts are
    map-side-combined aggregations. Relations evaluate independently
    (unionByName of tiny 1-row aggregates)."""
    if not relations:
        raise ValueError("fk_integrity: at least one relation required")
    outs = []
    for name, child, fk, parent, pk in relations:
        keys = parent.select(F.col(pk).alias("__pk")).distinct()
        nn = child.filter(F.col(fk).isNotNull())
        orphans = nn.join(
            keys, nn[fk] == keys["__pk"], "left_anti"
        ).agg(F.count(F.lit(1)).alias("n_orphans"))
        base = child.agg(
            F.count(F.lit(1)).alias("n_child"),
            F.sum(F.col(fk).isNull().cast("long")).alias("n_null_fk"),
        )
        outs.append(
            base.crossJoin(orphans).select(
                F.lit(str(name)).alias("relation"),
                "n_child",
                "n_null_fk",
                "n_orphans",
                F.when(
                    (F.col("n_child") - F.col("n_null_fk")) > 0,
                    F.round(
                        F.col("n_orphans")
                        / (F.col("n_child") - F.col("n_null_fk")),
                        6,
                    ),
                ).otherwise(F.lit(0.0)).alias("orphan_pct"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


CHECKSUM_MOD = 2305843009213693951  # 2^61 - 1, a Mersenne prime


def table_checksum(
    df: DataFrame,
    cols: list[str],
    group_col: str | None = None,
    null_sentinel: str = "<NULL>",
) -> DataFrame:
    """ORDER-FREE content checksum — the migration-validation
    fingerprint: every row hashes to H56(canonical '|'-join of
    ``cols``), and the hashes SUM (exact decimal(38,0), then mod
    2^61−1 so the output is a plain long at any corpus size). A sum is
    commutative, so row order, partitioning, and file layout cannot
    move the checksum — two engines (or a table before/after a
    rewrite) agree iff their row MULTISETS agree on the chosen columns.

    Columns must stringify engine-identically: ints, strings, dates,
    and decimals are safe; cast raw doubles to a fixed-scale decimal
    FIRST (double→string formatting is engine-specific). NULLs become
    ``null_sentinel`` (concat_ws would silently drop them, making
    ('a', NULL) collide with ('a',)).

    The join is made unambiguous by escaping ``\\``, ``|`` and ``<``
    (each prefixed with ``\\``) in every stringified value BEFORE
    joining: ('a|b','c') and ('a','b|c') now canonicalize differently,
    and a literal ``'<NULL>'`` string escapes to ``'\\<NULL>'`` so it
    cannot collide with the raw sentinel inserted for NULL. Remaining
    caveat: a custom ``null_sentinel`` must contain ``<``, ``|`` or
    ``\\`` (the default does) for the NULL/literal distinction to hold.

    Output: (group_col?, n_rows, checksum).

    Scale: one map-side-combined aggregation — the hash and the join
    are per-row JVM expressions; nothing shuffles but the final
    per-group partials."""
    from ..operators.text import h56

    canon = F.concat_ws(
        "|",
        *[
            F.coalesce(
                F.regexp_replace(
                    F.col(c).cast("string"), r"([\\|<])", r"\\$1"
                ),
                F.lit(null_sentinel),
            )
            for c in cols
        ],
    )
    keyed = df.withColumn("__h", h56(canon).cast("decimal(38,0)"))
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.pmod(F.sum("__h"), F.lit(CHECKSUM_MOD).cast("decimal(38,0)"))
        .cast("long")
        .alias("checksum"),
    ]
    if group_col is None:
        return keyed.agg(*aggs)
    return keyed.groupBy(group_col).agg(*aggs)


def freshness_report(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    anchor_ts: str | None = None,
) -> DataFrame:
    """Data-freshness audit per group — the first dashboard every data
    platform builds over a landed table: row count, first/last event
    time, and staleness (seconds since the group's last row) against
    ``anchor_ts`` (a literal timestamp in production; defaults to the
    table's own max timestamp so the report is deterministic without a
    wall clock).

    Output: (group_col, n_rows, first_ts, last_ts, staleness_s).

    Scale: one map-side-combined aggregation plus a broadcast 1-row
    anchor."""
    ts = F.col(ts_col).cast("timestamp")
    per = df.filter(ts.isNotNull()).groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(ts).alias("first_ts"),
        F.max(ts).alias("last_ts"),
    )
    if anchor_ts is None:
        anchor = df.agg(F.max(ts).alias("__anchor"))
        per = per.crossJoin(F.broadcast(anchor))
    else:
        per = per.withColumn(
            "__anchor", F.lit(anchor_ts).cast("timestamp")
        )
    return per.select(
        group_col,
        "n_rows",
        "first_ts",
        "last_ts",
        (
            F.col("__anchor").cast("long") - F.col("last_ts").cast("long")
        ).alias("staleness_s"),
    )
