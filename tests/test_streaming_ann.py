"""Streaming IVF index maintenance (watch_embeddings_ann): frozen
quantizer, epoch-append parity with the batch index, crash-replay
idempotence, and search over the streamed index."""

from __future__ import annotations

import numpy as np
import pytest

from process_alphafold3_outputs_spark.operators.similarity import (
    ivf_assign,
    ivf_centroids,
    ivf_search,
)
from process_alphafold3_outputs_spark.streaming.ingest import (
    read_state,
    watch_embeddings_ann,
)

DIM = 8
SCHEMA = "vec_id long, embedding array<float>"


def _vecs(spark, ids):
    rows = [
        (int(i), [float(x) for x in np.random.RandomState(i).randn(DIM)])
        for i in ids
    ]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def paths(tmp_path):
    return {
        "inbox": str(tmp_path / "inbox"),
        "index": str(tmp_path / "index"),
        "cents": str(tmp_path / "cents"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _drop(spark, paths, ids):
    _vecs(spark, ids).coalesce(1).write.mode("append").parquet(paths["inbox"])


def test_streamed_index_matches_batch_assignment(spark, paths):
    _drop(spark, paths, range(0, 24))
    q = watch_embeddings_ann(
        spark, paths["inbox"], paths["index"], paths["cents"],
        paths["ckpt"], n_cells=4,
    )
    try:
        q.processAllAvailable()
        _drop(spark, paths, range(24, 40))
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {
        (r.vec_id, r.cell)
        for r in spark.read.parquet(paths["index"]).collect()
    }
    # batch reference: SAME frozen quantizer (trained on epoch 0 only),
    # assignment over the union
    cents = ivf_centroids(_vecs(spark, range(0, 24)), n_cells=4)
    want = {
        (r.vec_id, r.cell)
        for r in ivf_assign(_vecs(spark, range(0, 40)), cents).collect()
    }
    assert streamed == want
    # quantizer is FROZEN: state equals the epoch-0 bootstrap exactly
    state = read_state(spark, paths["cents"], "cell int, cvec array<double>")
    got_c = {r.cell: tuple(r.cvec) for r in state.collect()}
    want_c = {r.cell: tuple(r.cvec) for r in cents.collect()}
    assert got_c == want_c


def test_replay_between_append_and_state_swap_is_idempotent(spark, paths):
    """Same crash window as the LSH band watcher test: epoch output
    lands, state swap doesn't, epoch replays — index rows and state
    must equal a never-crashed run."""
    from process_alphafold3_outputs_spark.streaming.ingest import (
        _write_epoch_output,
        roll_state,
    )

    def run_epoch(epoch, ids, crash=False):
        batch = _vecs(spark, ids)
        cents = read_state(
            spark, paths["cents"], "cell int, cvec array<double>",
            before_epoch=epoch,
        )
        if not cents.head(1):
            cents = ivf_centroids(batch, n_cells=2)
        assigned = ivf_assign(batch, cents)
        _write_epoch_output(
            assigned.select("vec_id", "cell", "vec"), paths["index"], epoch
        )
        if crash:
            return
        roll_state(cents, paths["cents"], epoch)

    run_epoch(0, range(0, 10))
    run_epoch(1, range(10, 16), crash=True)
    mid = sorted(
        (r.vec_id, r.cell)
        for r in spark.read.parquet(paths["index"]).collect()
    )
    run_epoch(1, range(10, 16))  # restart replay
    after = sorted(
        (r.vec_id, r.cell)
        for r in spark.read.parquet(paths["index"]).collect()
    )
    assert after == mid and len(after) == 16


def test_search_over_streamed_index_matches_batch_search(spark, paths):
    _drop(spark, paths, range(0, 32))
    q = watch_embeddings_ann(
        spark, paths["inbox"], paths["index"], paths["cents"],
        paths["ckpt"], n_cells=4,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    index = spark.read.parquet(paths["index"]).select("vec_id", "cell", "vec")
    cents = read_state(spark, paths["cents"], "cell int, cvec array<double>")
    queries = _vecs(spark, range(0, 6))
    got = {
        (r.query_id, r.rk): (r.neighbor_id, r.sim)
        for r in ivf_search(index, cents, queries, k=3, n_probe=2).collect()
    }
    batch_index = ivf_assign(_vecs(spark, range(0, 32)), cents)
    want = {
        (r.query_id, r.rk): (r.neighbor_id, r.sim)
        for r in ivf_search(
            batch_index.select("vec_id", "cell", "vec"), cents, queries,
            k=3, n_probe=2,
        ).collect()
    }
    assert got == want and len(got) == 18


# --------------------------------------------------------------------------
# IVF-PQ maintenance: frozen model, epoch-append parity, crash replay
# --------------------------------------------------------------------------


@pytest.fixture()
def pq_paths(tmp_path):
    return {
        "inbox": str(tmp_path / "inbox"),
        "codes": str(tmp_path / "codes"),
        "cents": str(tmp_path / "cents"),
        "cb": str(tmp_path / "cb"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def test_streamed_ivfpq_codes_match_frozen_batch_encode(spark, pq_paths):
    from process_alphafold3_outputs_spark.operators.similarity import (
        ivfpq_encode,
        ivfpq_index,
    )
    from process_alphafold3_outputs_spark.streaming.ingest import (
        watch_embeddings_ivfpq,
    )

    _vecs(spark, range(0, 24)).coalesce(1).write.mode("append").parquet(
        pq_paths["inbox"]
    )
    q = watch_embeddings_ivfpq(
        spark, pq_paths["inbox"], pq_paths["codes"], pq_paths["cents"],
        pq_paths["cb"], pq_paths["ckpt"], n_cells=4, m=4, kc=8, dim=DIM,
    )
    try:
        q.processAllAvailable()
        _vecs(spark, range(24, 40)).coalesce(1).write.mode(
            "append"
        ).parquet(pq_paths["inbox"])
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {
        r.vec_id: (r.cell, tuple(r.codes))
        for r in spark.read.parquet(pq_paths["codes"]).collect()
    }
    # batch reference: model trained on epoch 0 only, union encoded
    # against the FROZEN model
    cents, cb, boot_codes = ivfpq_index(
        _vecs(spark, range(0, 24)), n_cells=4, m=4, kc=8, dim=DIM
    )
    want = {
        r.vec_id: (r.cell, tuple(r.codes))
        for r in ivfpq_encode(
            _vecs(spark, range(0, 40)), cents, cb, m=4, dim=DIM
        ).collect()
    }
    assert streamed == want
    # both model tables are FROZEN at the epoch-0 bootstrap
    got_cb = {
        (r.sub, r.code): tuple(r.cvec)
        for r in read_state(
            spark, pq_paths["cb"], "sub int, code int, cvec array<double>"
        ).collect()
    }
    want_cb = {(r.sub, r.code): tuple(r.cvec) for r in cb.collect()}
    assert got_cb == want_cb


def test_ivfpq_replay_between_output_and_state_swap(spark, pq_paths):
    """Crash window: epoch codes land, the two state swaps don't,
    epoch replays — codes and model state must equal a never-crashed
    run (the replayed epoch re-bootstraps from the SAME pre-epoch
    state because read_state excludes the replayed epoch)."""
    from process_alphafold3_outputs_spark.operators.similarity import (
        ivfpq_encode,
        ivfpq_index,
    )
    from process_alphafold3_outputs_spark.streaming.ingest import (
        _write_epoch_output,
        roll_state,
    )

    def run_epoch(epoch, ids, crash=False):
        batch = _vecs(spark, ids)
        cents = read_state(
            spark, pq_paths["cents"], "cell int, ccvec array<double>",
            before_epoch=epoch,
        )
        cb = read_state(
            spark, pq_paths["cb"],
            "sub int, code int, cvec array<double>", before_epoch=epoch,
        )
        if not cents.head(1):
            cents, cb, codes = ivfpq_index(batch, n_cells=2, m=4, kc=4, dim=DIM)
        else:
            codes = ivfpq_encode(batch, cents, cb, m=4, dim=DIM)
        _write_epoch_output(codes, pq_paths["codes"], epoch)
        if crash:
            return
        roll_state(cents, pq_paths["cents"], epoch)
        roll_state(cb, pq_paths["cb"], epoch)

    run_epoch(0, range(0, 10))
    run_epoch(1, range(10, 16), crash=True)
    mid = sorted(
        (r.vec_id, r.cell, tuple(r.codes))
        for r in spark.read.parquet(pq_paths["codes"]).collect()
    )
    run_epoch(1, range(10, 16))  # restart replay
    after = sorted(
        (r.vec_id, r.cell, tuple(r.codes))
        for r in spark.read.parquet(pq_paths["codes"]).collect()
    )
    assert after == mid and len(after) == 16


def test_search_over_streamed_ivfpq_index(spark, pq_paths):
    from process_alphafold3_outputs_spark.operators.similarity import (
        ivfpq_search,
    )
    from process_alphafold3_outputs_spark.streaming.ingest import (
        watch_embeddings_ivfpq,
    )

    _vecs(spark, range(0, 32)).coalesce(1).write.mode("append").parquet(
        pq_paths["inbox"]
    )
    q = watch_embeddings_ivfpq(
        spark, pq_paths["inbox"], pq_paths["codes"], pq_paths["cents"],
        pq_paths["cb"], pq_paths["ckpt"], n_cells=4, m=4, kc=8, dim=DIM,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    codes = spark.read.parquet(pq_paths["codes"]).select(
        "vec_id", "cell", "codes"
    )
    cents = read_state(
        spark, pq_paths["cents"], "cell int, ccvec array<double>"
    )
    cb = read_state(
        spark, pq_paths["cb"], "sub int, code int, cvec array<double>"
    )
    out = ivfpq_search(
        codes, cents, cb, _vecs(spark, range(0, 4)), k=3, n_probe=2, m=4
    ).collect()
    assert len(out) > 0
    assert all(r.rk <= 3 and -1.5 <= r.sim <= 1.5 for r in out)
