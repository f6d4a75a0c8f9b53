"""Incremental table maintenance — the lakehouse upkeep operators a
100 TB training-data pipeline runs between ingest and training: MERGE
upsert, CDC changelog application (latest-wins ordered fold), SCD2
dimension history, snapshot diff, and a small-file compaction planner.

The reference engine (process_af3_outputs.py) rebuilds its outputs from
scratch every run; at corpus scale the same pipelines run INCREMENTALLY —
yesterday's snapshot plus today's changes — so the engine needs the
merge family as first-class relational operators, not a storage-format
dependency. Everything here is plain DataFrame algebra (works on any
sink: parquet directories, Hive tables, or a table format's staging
input) and every operator is one keyed shuffle:

- :func:`merge_upsert` — union + one ``max_by`` hash aggregation (NOT a
  full-outer join: the agg combines map-side, so an update batch that
  is tiny next to the target never forces a join of two sorted 100 TB
  sides; AQE cannot save a join from shuffling the big side, but a
  partial agg collapses the duplicate keys before the wire).
- :func:`apply_changelog` — per-key ``max_by(seq)`` fold of the change
  stream, then the same merge; I/U/D ops, deletes tombstone.
- :func:`scd2_apply` — one key-equi join of the CURRENT slice against
  the update batch (history rows pass through untouched) + a union.
- :func:`snapshot_diff` — one full-outer key join emitting
  added/deleted/changed with null-safe column compares.
- :func:`compaction_plan` — per-partition prefix-sum binning of
  small-file stats into ~target-sized rewrite groups (the file-stats
  table is metadata-sized: one row per file, never data rows).

NULL semantics: attribute comparisons are null-safe everywhere
(``<=>`` / IS NOT DISTINCT FROM) — NULL→value and value→NULL are
CHANGES, NULL→NULL is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _attrs_equal(left_prefix: str, right_prefix: str, cols: list[str]):
    """Null-safe conjunction ``l.c <=> r.c`` over ``cols`` (TRUE when
    both sides are NULL — a non-change)."""
    cond = F.lit(True)
    for c in cols:
        cond = cond & F.col(f"{left_prefix}.{c}").eqNullSafe(
            F.col(f"{right_prefix}.{c}")
        )
    return cond


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    delete_col: str | None = None,
    assert_unique: bool = False,
) -> DataFrame:
    """MERGE INTO semantics as one hash aggregation: per key, an update
    row REPLACES the target row (whole-row semantics — both frames must
    share the target's columns); keys only in ``updates`` insert; keys
    only in ``target`` pass through; when ``delete_col`` names a boolean
    column on ``updates``, true rows tombstone their key instead.

    ``updates`` must be key-unique (one intended final state per key —
    fold an ordered change stream with :func:`apply_changelog` first);
    with duplicate update keys the survivor would be nondeterministic,
    exactly the ambiguity SQL MERGE rejects at runtime. Pass
    ``assert_unique=True`` to get MERGE's loud behavior — one EAGER
    aggregate over the update batch (batch-sized, not target-sized)
    raising with the duplicate-key count before anything merges.

    Scale shape: union + ``max_by(row, precedence)`` groupBy — a single
    key-hashed shuffle with map-side partial combine. No join: the
    common case (update batch ≪ target) collapses each updated key to
    one row per map task before anything crosses the wire, and the
    untouched-key majority moves exactly once, as it must for a
    whole-row rewrite."""
    cols = [c for c in target.columns]
    missing = [c for c in cols if c not in updates.columns]
    if missing:
        raise ValueError(f"updates is missing target columns: {missing}")
    for k in keys:
        if k not in cols:
            raise ValueError(f"key column {k!r} not in target")
    if assert_unique:
        dup = (
            updates.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .count()
        )
        if dup:
            raise ValueError(
                f"updates has {dup} duplicate merge key(s); MERGE "
                "semantics require one final state per key — fold an "
                "ordered stream with apply_changelog first"
            )
    if delete_col is not None:
        dels = F.coalesce(F.col(delete_col), F.lit(False))
    else:
        dels = F.lit(False)
    t = target.select(
        *cols,
        F.lit(0).alias("_prec"),
        F.lit(False).alias("_del"),
    )
    u = updates.select(*cols, F.lit(1).alias("_prec"), dels.alias("_del"))
    non_keys = [c for c in cols if c not in keys]
    merged = (
        t.unionByName(u)
        .groupBy(*keys)
        .agg(
            F.max_by(
                F.struct(*non_keys, F.col("_del")), F.col("_prec")
            ).alias("_r"),
        )
        .filter(~F.col("_r._del"))
        .select(*keys, *[F.col(f"_r.{c}").alias(c) for c in non_keys])
    )
    return merged.select(*cols)


def apply_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC change stream to a snapshot: ``changes`` carries the
    snapshot's columns plus ``op`` ('I'|'U'|'D') and a per-key-unique
    ordering column ``seq``; for each key only the HIGHEST-seq change
    matters (latest-wins — an insert after a delete resurrects the key,
    a trailing delete tombstones it regardless of history). Equivalent
    to replaying the log in order, at the cost of one fold.

    Two keyed shuffles total, both on ``keys``: the ``max_by(seq)``
    fold (map-side combine — a hot key's thousand updates collapse to
    one row per map task) and the merge aggregation. Seq ties within a
    key are rejected ambiguity in SQL terms; here the fold breaks them
    by op precedence D > U > I (delete wins) so the result is at least
    deterministic — but per-key-unique seqs are the contract."""
    cols = list(snapshot.columns)
    for extra in (seq_col, op_col):
        if extra not in changes.columns:
            raise ValueError(f"changes is missing {extra!r}")
    missing = [c for c in cols if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing snapshot columns: {missing}")
    # op precedence only breaks exact seq ties deterministically
    op_rank = (
        F.when(F.col(op_col) == "D", 2)
        .when(F.col(op_col) == "U", 1)
        .otherwise(0)
    )
    latest = (
        changes.groupBy(*keys)
        .agg(
            F.max_by(
                F.struct(
                    *[c for c in cols if c not in keys],
                    (F.col(op_col) == "D").alias("_is_del"),
                ),
                F.struct(F.col(seq_col), op_rank.alias("_opr")),
            ).alias("_c")
        )
        .select(
            *keys,
            *[
                F.col(f"_c.{c}").alias(c)
                for c in cols
                if c not in keys
            ],
            F.col("_c._is_del").alias("_is_del"),
        )
    )
    return merge_upsert(snapshot, latest, keys, delete_col="_is_del")


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    keys: list[str],
    attrs: list[str],
    effective_col: str = "effective",
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: ``dim`` is the versioned
    history (keys + attrs + valid_from/valid_to/is_current); ``updates``
    is a key-unique batch of observed states (keys + attrs +
    ``effective``). A current row whose attrs differ (null-safely) from
    its update is CLOSED (valid_to = effective, is_current = false) and
    a new open version appended; unchanged and un-updated current rows
    pass through; brand-new keys open their first version; closed
    history rows are never touched.

    Scale shape: history rows (``is_current = false``) bypass the join
    entirely — only the current slice joins the update batch, one
    key-equi join Catalyst broadcasts when the batch is small. The
    update side is read once and reused for the new-version branch (an
    un-staged plan reads it twice; updates batches are metadata-small
    next to the dimension, so the re-read is the cheap side)."""
    history = dim.filter(~F.col(current_col))
    current = dim.filter(F.col(current_col))
    # presence marker, not attr/effective NULL-ness: an update row may
    # legitimately carry NULL attrs
    upd = updates.withColumn("_u_present", F.lit(1))
    j = current.alias("c").join(
        upd.alias("u"), on=keys, how="left"
    )
    changed = F.col("u._u_present").isNotNull() & ~_attrs_equal(
        "c", "u", attrs
    )
    kept_or_closed = j.select(
        *keys,
        *[F.col(f"c.{a}").alias(a) for a in attrs],
        F.col(f"c.{valid_from_col}").alias(valid_from_col),
        F.when(changed, F.col(f"u.{effective_col}"))
        .otherwise(F.col(f"c.{valid_to_col}"))
        .alias(valid_to_col),
        F.when(changed, F.lit(False))
        .otherwise(F.col(f"c.{current_col}"))
        .alias(current_col),
    )
    # new versions: updates whose key has no current row, or whose
    # attrs differ from the current row
    nj = upd.alias("u").join(current.alias("c"), on=keys, how="left")
    opens = nj.filter(
        F.col(f"c.{current_col}").isNull() | ~_attrs_equal("u", "c", attrs)
    ).select(
        *keys,
        *[F.col(f"u.{a}").alias(a) for a in attrs],
        F.col(f"u.{effective_col}").alias(valid_from_col),
        F.lit(None).cast(dim.schema[valid_to_col].dataType).alias(
            valid_to_col
        ),
        F.lit(True).alias(current_col),
    )
    out_cols = [*keys, *attrs, valid_from_col, valid_to_col, current_col]
    return (
        history.select(*out_cols)
        .unionByName(kept_or_closed.select(*out_cols))
        .unionByName(opens.select(*out_cols))
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
) -> DataFrame:
    """(keys..., change_type) — 'added' | 'deleted' | 'changed' rows
    between two snapshots sharing a schema; unchanged keys are omitted
    (the interesting output is sparse — at 100 TB the diff of two daily
    snapshots is the day's churn, not the table). One full-outer key
    join with null-safe column compares; on bucketed/co-partitioned
    snapshots the join is shuffle-free."""
    non_keys = [c for c in old.columns if c not in keys]
    # presence flags must not rely on attr NULLs (a present row may
    # hold NULL attrs) — mark key-side matches via a literal marker
    o_present = F.col("o._present").isNotNull()
    n_present = F.col("n._present").isNotNull()
    j = (
        old.withColumn("_present", F.lit(1))
        .alias("o")
        .join(
            new.withColumn("_present", F.lit(1)).alias("n"),
            on=keys,
            how="full_outer",
        )
    )
    change = (
        F.when(~o_present, F.lit("added"))
        .when(~n_present, F.lit("deleted"))
        .when(~_attrs_equal("o", "n", non_keys), F.lit("changed"))
    )
    return (
        j.select(*keys, change.alias("change_type"))
        .filter(F.col("change_type").isNotNull())
    )


def compaction_plan(
    files: DataFrame,
    partition_cols: list[str],
    name_col: str = "file_name",
    size_col: str = "bytes",
    target_bytes: int = 128 * 1024 * 1024,
    small_threshold: int | None = None,
) -> DataFrame:
    """(partition..., file_name, bytes, compaction_group, group_bytes,
    group_files) — a deterministic rewrite plan over a file-stats table
    (one row per data file: partition values, name, size): within each
    partition, files smaller than ``small_threshold`` (default: the
    target) are packed in name order into groups of ~``target_bytes``
    by prefix-sum binning (``group = floor((cumsum − size) / target)``
    — each group starts before the target boundary its first file
    crosses). Groups that would rewrite a single file are dropped:
    rewriting one file merges nothing.

    The input is METADATA (a listing or a table-format manifest), so
    every window here runs over file counts, not data rows; the plan's
    output feeds whatever executes the rewrite (a coalesce-write job
    per group). Right-sized files (≥ threshold) never appear in the
    plan."""
    thr = small_threshold if small_threshold is not None else target_bytes
    small = files.filter(F.col(size_col) < thr)
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(name_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = small.withColumn(
        "compaction_group",
        F.floor(
            (F.sum(size_col).over(w) - F.col(size_col))
            / F.lit(int(target_bytes))
        ).cast("long"),
    )
    gw = Window.partitionBy(*partition_cols, "compaction_group")
    return (
        binned.withColumn(
            "group_bytes", F.sum(size_col).over(gw).cast("long")
        )
        .withColumn("group_files", F.count(F.lit(1)).over(gw).cast("long"))
        .filter(F.col("group_files") > 1)
        .select(
            *partition_cols,
            name_col,
            F.col(size_col).cast("long").alias(size_col),
            "compaction_group",
            "group_bytes",
            "group_files",
        )
    )
