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
