"""Fuzzy entity resolution (operators/entity.py): blocking, edit
distance, transitive closure, row-level mapping."""

from __future__ import annotations

from process_alphafold3_outputs_spark.operators import entity


def _resolve(spark, rows, max_distance=1):
    df = spark.createDataFrame(rows, "id long, name string")
    out = entity.resolve_entities(
        df, id_col="id", name_col="name", max_distance=max_distance
    )
    return {r.id: (r.name_norm, r.entity_id) for r in out.collect()}


def test_transitive_chain_merges_into_one_entity(spark):
    # aa~ab (1), ab~bb (1), but aa!~bb (2) — only the transitive
    # closure puts all three in one entity (the reason ER needs CC,
    # not a pairwise drop rule)
    got = _resolve(
        spark,
        [(10, "x aa"), (20, "x ab"), (30, "x bb"), (40, "x zz")],
        max_distance=1,
    )
    assert got[10][1] == got[20][1] == got[30][1] == 10
    assert got[40] == ("x zz", 40)  # singleton keeps its own id


def test_blocking_prevents_cross_block_matches(spark):
    # identical tails, different first token => different blocks =>
    # never compared (blocking is part of the match spec)
    got = _resolve(spark, [(1, "foo tail"), (2, "bar tail")], max_distance=3)
    assert got[1][1] == 1 and got[2][1] == 2


def test_normalization_and_exact_duplicates(spark):
    # case/whitespace variants normalize to one name; entity id is the
    # min row id across the whole cluster
    got = _resolve(
        spark,
        [(5, "  Hot   Rod "), (3, "hot rod"), (9, "hot rods")],
        max_distance=1,
    )
    assert got[5][0] == got[3][0] == "hot rod"
    assert got[5][1] == got[3][1] == got[9][1] == 3


def test_match_pairs_are_distinct_name_level(spark):
    names = spark.createDataFrame(
        [("a x",), ("a x",), ("a y",)], "name string"
    )
    pairs = entity.name_match_pairs(names, "name", max_distance=1)
    assert [(r.name_a, r.name_b) for r in pairs.collect()] == [("a x", "a y")]


# -- incremental + streaming -------------------------------------------------

def test_incremental_adoption_and_new_entities(spark):
    from process_alphafold3_outputs_spark.operators.entity import (
        incremental_resolve,
    )

    canon = spark.createDataFrame(
        [("hot rod", 3), ("cold bolt", 7)], "name_norm string, entity_id long"
    )
    ship = spark.createDataFrame(
        [
            (100, "Hot  Rod"),    # exact adoption -> 3
            (101, "hot rods"),    # fuzzy adoption (lev 1) -> 3
            (102, "zz aa"),       # new entity, clusters with 103
            (103, "zz ab"),
            (104, "qq qq"),       # new singleton entity
        ],
        "id long, name string",
    )
    labeled, updated = incremental_resolve(
        ship, canon, id_col="id", name_col="name", max_distance=1
    )
    got = {r.id: r.entity_id for r in labeled.collect()}
    assert got == {100: 3, 101: 3, 102: 102, 103: 102, 104: 104}
    up = {r.name_norm: r.entity_id for r in updated.collect()}
    assert up == {
        "hot rod": 3, "cold bolt": 7, "hot rods": 3,
        "zz aa": 102, "zz ab": 102, "qq qq": 104,
    }


def test_incremental_never_merges_existing_entities(spark):
    from process_alphafold3_outputs_spark.operators.entity import (
        incremental_resolve,
    )

    # "x ab" bridges two existing entities (lev 1 to both) — it must
    # ADOPT the minimum entity, not merge them
    canon = spark.createDataFrame(
        [("x aa", 1), ("x bb", 2)], "name_norm string, entity_id long"
    )
    ship = spark.createDataFrame([(50, "x ab")], "id long, name string")
    labeled, updated = incremental_resolve(
        ship, canon, id_col="id", name_col="name", max_distance=1
    )
    assert [r.entity_id for r in labeled.collect()] == [1]
    up = {r.name_norm: r.entity_id for r in updated.collect()}
    assert up == {"x aa": 1, "x bb": 2, "x ab": 1}


def test_watch_entities_stable_ids_across_epochs(spark, tmp_path):
    from process_alphafold3_outputs_spark.streaming.ingest import (
        read_state,
        watch_entities,
    )

    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "out")
    canon = str(tmp_path / "canon")
    ckpt = str(tmp_path / "ckpt")

    def drop(rows):
        spark.createDataFrame(rows, "id long, name string").coalesce(
            1
        ).write.mode("append").parquet(inbox)

    drop([(1, "hot rod"), (2, "cold bolt")])
    q = watch_entities(
        spark, inbox, out, canon, ckpt, max_distance=1
    )
    try:
        q.processAllAvailable()
        # epoch 1: exact repeat, fuzzy variant, brand-new name
        drop([(10, "HOT ROD"), (11, "hot rods"), (12, "warm pipe")])
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.id: r.entity_id for r in spark.read.parquet(out).collect()}
    assert got == {1: 1, 2: 2, 10: 1, 11: 1, 12: 12}
    state = {
        r.name_norm: r.entity_id
        for r in read_state(
            spark, canon, "name_norm string, entity_id long"
        ).collect()
    }
    assert state == {
        "hot rod": 1, "cold bolt": 2, "hot rods": 1, "warm pipe": 12,
    }
