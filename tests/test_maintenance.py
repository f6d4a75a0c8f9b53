"""Incremental table maintenance — MERGE/CDC/SCD2/diff/compaction.

Each operator is pinned against a hand-computed expected state, with
the NULL-semantics edge cases spelled out (null-safe attr compares;
presence markers, not attr NULL-ness)."""

from __future__ import annotations

import pytest

from process_alphafold3_outputs_spark.operators.maintenance import (
    apply_changelog,
    compaction_plan,
    merge_upsert,
    scd2_apply,
    snapshot_diff,
)

TGT = "k long, name string, v long"


def rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_merge_upsert_update_insert_delete_passthrough(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], TGT
    )
    updates = spark.createDataFrame(
        [(2, "B", 99, False), (4, "d", 40, False), (3, None, None, True)],
        TGT + ", is_deleted boolean",
    )
    out = merge_upsert(target, updates, ["k"], delete_col="is_deleted")
    assert rows(out, "k", "name", "v") == [
        (1, "a", 10),   # untouched passes through
        (2, "B", 99),   # updated (whole-row replace)
        (4, "d", 40),   # inserted
    ]                   # 3 deleted
    assert out.columns == ["k", "name", "v"]


def test_merge_upsert_null_delete_flag_means_keep(spark):
    target = spark.createDataFrame([(1, "a", 10)], TGT)
    updates = spark.createDataFrame(
        [(1, "A", 11, None)], TGT + ", is_deleted boolean"
    )
    out = merge_upsert(target, updates, ["k"], delete_col="is_deleted")
    assert rows(out, "k", "name", "v") == [(1, "A", 11)]


def test_merge_upsert_missing_column_raises(spark):
    target = spark.createDataFrame([(1, "a", 10)], TGT)
    updates = spark.createDataFrame([(1, "a")], "k long, name string")
    with pytest.raises(ValueError, match="missing target columns"):
        merge_upsert(target, updates, ["k"])


def test_apply_changelog_latest_wins(spark):
    snap = spark.createDataFrame([(1, "a", 10), (2, "b", 20)], TGT)
    ch = spark.createDataFrame(
        [
            # key 1: U then D -> deleted
            (1, "a1", 11, 1, "U"),
            (1, None, None, 2, "D"),
            # key 2: three updates -> highest seq wins
            (2, "b1", 21, 1, "U"),
            (2, "b3", 23, 3, "U"),
            (2, "b2", 22, 2, "U"),
            # key 3: D then re-insert -> resurrected
            (3, None, None, 1, "D"),
            (3, "c", 33, 2, "I"),
            # key 4: plain insert of a new key
            (4, "d", 44, 1, "I"),
        ],
        TGT + ", seq long, op string",
    )
    out = apply_changelog(snap, ch, ["k"], seq_col="seq", op_col="op")
    assert rows(out, "k", "name", "v") == [
        (2, "b3", 23),
        (3, "c", 33),
        (4, "d", 44),
    ]


def test_apply_changelog_seq_tie_delete_wins(spark):
    snap = spark.createDataFrame([(1, "a", 10)], TGT)
    ch = spark.createDataFrame(
        [(1, "a1", 11, 5, "U"), (1, None, None, 5, "D")],
        TGT + ", seq long, op string",
    )
    out = apply_changelog(snap, ch, ["k"])
    assert rows(out, "k") == []


DIM = (
    "k long, seg string, bal double, valid_from long, valid_to long, "
    "is_current boolean"
)


def test_scd2_close_open_passthrough_and_noop(spark):
    dim = spark.createDataFrame(
        [
            (1, "AUTO", 1.0, 0, 50, False),   # closed history: untouched
            (1, "BIKE", 2.0, 50, None, True),  # current, update CHANGES it
            (2, "SHIP", 3.0, 0, None, True),   # current, update matches: noop
            (3, "RAIL", 4.0, 0, None, True),   # current, no update row
        ],
        DIM,
    )
    upd = spark.createDataFrame(
        [
            (1, "MOVED", 2.5, 100),
            (2, "SHIP", 3.0, 100),   # identical attrs -> no new version
            (9, "NEW", 9.0, 100),    # brand-new key -> first version
        ],
        "k long, seg string, bal double, effective long",
    )
    out = scd2_apply(dim, upd, ["k"], ["seg", "bal"], "effective")
    got = rows(out, "k", "seg", "bal", "valid_from", "valid_to", "is_current")
    assert got == [
        (1, "AUTO", 1.0, 0, 50, False),
        (1, "BIKE", 2.0, 50, 100, False),     # closed at effective
        (1, "MOVED", 2.5, 100, None, True),   # new open version
        (2, "SHIP", 3.0, 0, None, True),
        (3, "RAIL", 4.0, 0, None, True),
        (9, "NEW", 9.0, 100, None, True),
    ]


def test_scd2_null_attrs_are_null_safe(spark):
    dim = spark.createDataFrame([(1, None, None, 0, None, True)], DIM)
    upd = spark.createDataFrame(
        [(1, None, None, 10)], "k long, seg string, bal double, effective long"
    )
    out = scd2_apply(dim, upd, ["k"], ["seg", "bal"], "effective")
    # NULL == NULL is a NON-change: no close, no new version
    assert rows(out, "k", "valid_to", "is_current") == [(1, None, True)]


def test_snapshot_diff_added_deleted_changed_null_safe(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, None, 30), (4, "d", None)], TGT
    )
    new = spark.createDataFrame(
        [(2, "B", 20), (3, None, 30), (4, "d", 40), (5, "e", 50)], TGT
    )
    out = snapshot_diff(old, new, ["k"])
    assert rows(out, "k", "change_type") == [
        (1, "deleted"),
        (2, "changed"),
        # 3 unchanged (NULL <=> NULL) -> omitted
        (4, "changed"),  # NULL -> 40 IS a change
        (5, "added"),
    ]


def test_compaction_plan_bins_small_files_per_partition(spark):
    files = spark.createDataFrame(
        [
            ("p1", "f1", 40), ("p1", "f2", 40), ("p1", "f3", 40),
            ("p1", "f4", 40),
            ("p1", "big", 500),         # right-sized: excluded
            ("p2", "g1", 10), ("p2", "g2", 10),
            ("p3", "lone", 10),         # singleton group: dropped
        ],
        "part string, file_name string, bytes long",
    )
    out = compaction_plan(
        files, ["part"], target_bytes=100, small_threshold=100
    )
    got = rows(out, "part", "file_name", "compaction_group", "group_files")
    # p1 prefix sums: 40,80,120,160 -> groups floor((cum-size)/100):
    # f1:0 f2:0 f3:0 f4:1 -> group 1 is a singleton -> dropped
    assert got == [
        ("p1", "f1", 0, 3),
        ("p1", "f2", 0, 3),
        ("p1", "f3", 0, 3),
        ("p2", "g1", 0, 2),
        ("p2", "g2", 0, 2),
    ]
    gb = {tuple(r[:2]): r.group_bytes for r in out.collect()}
    assert gb[("p1", "f1")] == 120 and gb[("p2", "g1")] == 20


def test_merge_is_idempotent_and_composes_with_diff(spark):
    """Applying the same update batch twice equals once, and
    snapshot_diff(target, merged) reports exactly the batch's effect."""
    target = spark.createDataFrame(
        [(i, f"n{i}", i * 10) for i in range(1, 8)], TGT
    )
    updates = spark.createDataFrame(
        [(2, "X", 0, False), (9, "new", 90, False), (5, None, None, True)],
        TGT + ", is_deleted boolean",
    )
    once = merge_upsert(target, updates, ["k"], delete_col="is_deleted")
    twice = merge_upsert(once, updates, ["k"], delete_col="is_deleted")
    assert rows(once, "k", "name", "v") == rows(twice, "k", "name", "v")
    d = snapshot_diff(target, once, ["k"])
    assert rows(d, "k", "change_type") == [
        (2, "changed"), (5, "deleted"), (9, "added")
    ]


def test_watch_table_cdc_stream_equals_batch_and_replays(spark, tmp_path):
    """Two epochs of CDC changes through the watcher must leave the
    SAME snapshot as folding both batches sequentially in batch mode
    (same kernel), the per-epoch churn report must account for the
    epoch's effect, and a crash-replayed epoch must be idempotent."""
    import os

    from process_alphafold3_outputs_spark.streaming.ingest import (
        _cdc_process_batch,
        read_state,
        watch_table_cdc,
    )

    ch_schema = TGT + ", seq long, op string"
    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "churn")
    snap_path = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")

    e0 = [
        (1, "a", 10, 1, "I"),
        (2, "b", 20, 1, "I"),
        (2, "b2", 22, 2, "U"),   # within-epoch fold: seq 2 wins
        (3, "c", 30, 1, "I"),
    ]
    e1 = [
        (2, None, None, 1, "D"),  # cross-epoch: arrival order wins
        (3, "c9", 39, 1, "U"),
        (4, "d", 40, 1, "I"),
    ]
    spark.createDataFrame(e0, ch_schema).coalesce(1).write.mode(
        "append"
    ).parquet(inbox)
    q = watch_table_cdc(
        spark, inbox, out, snap_path, ckpt, ch_schema, ["k"]
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(e1, ch_schema).coalesce(1).write.mode(
            "append"
        ).parquet(inbox)
        q.processAllAvailable()
    finally:
        q.stop()

    state = read_state(spark, snap_path, TGT)
    assert rows(state, "k", "name", "v") == [
        (1, "a", 10),
        (3, "c9", 39),
        (4, "d", 40),
    ]
    # batch twin over the same two shipments, folded sequentially
    empty = spark.createDataFrame([], TGT)
    b0 = apply_changelog(empty, spark.createDataFrame(e0, ch_schema), ["k"])
    b1 = apply_changelog(b0, spark.createDataFrame(e1, ch_schema), ["k"])
    assert rows(state, "k", "name", "v") == rows(b1, "k", "name", "v")
    # epoch-1 churn: 2 deleted, 3 changed, 4 added, 3 live
    churn = {
        r.change_type: r.n
        for r in spark.read.parquet(os.path.join(out, "epoch_id=1")).collect()
    }
    assert churn == {"deleted": 1, "changed": 1, "added": 1, "live_rows": 3}
    # crash replay of epoch 1: state reads exclude the replayed epoch,
    # output overwrites -> same snapshot, same churn
    _cdc_process_batch(
        spark.createDataFrame(e1, ch_schema), 1, snap_path, out, ["k"],
        "seq", "op",
    )
    replay = read_state(spark, snap_path, TGT)
    assert rows(replay, "k", "name", "v") == rows(b1, "k", "name", "v")
    churn2 = {
        r.change_type: r.n
        for r in spark.read.parquet(os.path.join(out, "epoch_id=1")).collect()
    }
    assert churn2 == churn


def test_file_stats_lists_real_partitioned_layout(spark, tmp_path):
    """file_stats walks a real partitioned parquet directory via the
    Hadoop FS API: hive k=v segments become columns, control files are
    skipped, and the listing feeds compaction_plan directly."""
    from process_alphafold3_outputs_spark.sources.layout import file_stats

    d = str(tmp_path / "tbl")
    spark.range(300).selectExpr("id", "id % 2 AS g").write.partitionBy(
        "g"
    ).parquet(d)
    stats = file_stats(spark, d, ["g"])
    got = stats.collect()
    assert all(r.bytes > 0 for r in got)
    assert {r.g for r in got} == {"0", "1"}
    assert not any("_SUCCESS" in r.file_name for r in got)
    plan = compaction_plan(stats, ["g"], target_bytes=10_000_000)
    # every small file lands in a (per-partition) rewrite group
    assert plan.count() == len(got)
    assert plan.select("g").distinct().count() == 2


def test_cli_compact_plan_path_mode(spark, tmp_path):
    """compact-plan --path lists the directory itself; --files and
    --path are mutually exclusive."""
    import pytest as _pytest

    from process_alphafold3_outputs_spark import corpus_cli

    d = str(tmp_path / "tbl")
    spark.range(100).selectExpr("id", "id % 2 AS g").write.partitionBy(
        "g"
    ).parquet(d)
    args = corpus_cli.build_parser().parse_args(
        ["compact-plan", "--path", d, "--partition-col", "g",
         "--target-bytes", "10000000", "--out", str(tmp_path / "plan")]
    )
    res = corpus_cli.run(args, spark)
    assert res["rows"] > 0
    bad = corpus_cli.build_parser().parse_args(
        ["compact-plan", "--partition-col", "g",
         "--out", str(tmp_path / "nope")]
    )
    with _pytest.raises(SystemExit):
        corpus_cli.run(bad, spark)


def test_merge_assert_unique_rejects_ambiguous_batch(spark):
    """assert_unique=True gives SQL MERGE's loud behavior on duplicate
    update keys; unique batches pass through unchanged."""
    target = spark.createDataFrame([(1, "a", 10)], TGT)
    dup = spark.createDataFrame(
        [(1, "x", 1, False), (1, "y", 2, False)],
        TGT + ", is_deleted boolean",
    )
    with pytest.raises(ValueError, match="duplicate merge key"):
        merge_upsert(
            target, dup, ["k"], delete_col="is_deleted", assert_unique=True
        )
    ok = spark.createDataFrame(
        [(1, "x", 1, False)], TGT + ", is_deleted boolean"
    )
    out = merge_upsert(
        target, ok, ["k"], delete_col="is_deleted", assert_unique=True
    )
    assert rows(out, "k", "name", "v") == [(1, "x", 1)]
