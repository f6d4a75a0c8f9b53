"""Differential for :func:`operators.structures.superimpose_models`
(Kabsch optimal-superposition RMSD) against a sequential numpy
reference that explicitly builds the rotation matrix and rotates the
coordinates — the engine uses the trace identity instead, so agreement
pins both the algebra and the (job, chain, residue) pairing join.

This is the extension the reference README claims (README.md:98-104)
but whose script never executes (dead ``Superimposer`` import,
process_af3_outputs.py:10).
"""

from __future__ import annotations

import numpy as np
import pytest

from process_alphafold3_outputs_spark.operators.structures import (
    superimpose_models,
)

ATOMS_SCHEMA = (
    "job string, model_id long, chain_id string, residue_id long, "
    "atom_name string, x double, y double, z double"
)


def _reference_rmsd(p: np.ndarray, q: np.ndarray) -> float:
    """Textbook Kabsch: build R, rotate, measure — no shortcuts."""
    pc = p - p.mean(axis=0)
    qc = q - q.mean(axis=0)
    u, _, vt = np.linalg.svd(pc.T @ qc)
    d = np.sign(np.linalg.det(vt.T @ u.T)) or 1.0
    r = vt.T @ np.diag([1.0, 1.0, d]) @ u.T
    moved = pc @ r.T
    return float(np.sqrt(((moved - qc) ** 2).sum() / len(p)))


def _rows(job, model, coords, chain="A", atom="CA"):
    return [
        (job, model, chain, i + 1, atom, float(x), float(y), float(z))
        for i, (x, y, z) in enumerate(coords)
    ]


def _random_rotation(rng: np.random.RandomState) -> np.ndarray:
    m = rng.randn(3, 3)
    q, r = np.linalg.qr(m)
    q *= np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


def test_rigid_transform_has_zero_rmsd(spark):
    rng = np.random.RandomState(7)
    ref = rng.randn(20, 3) * 10
    moved = ref @ _random_rotation(rng).T + np.array([5.0, -3.0, 12.0])
    df = spark.createDataFrame(
        _rows("j1", 0, ref) + _rows("j1", 1, moved), ATOMS_SCHEMA
    )
    out = superimpose_models(df).collect()
    assert len(out) == 1
    assert out[0].n_atoms == 20
    assert out[0].rmsd == pytest.approx(0.0, abs=1e-6)


def test_matches_sequential_numpy_reference(spark):
    rng = np.random.RandomState(13)
    rows, want = [], {}
    for j in range(4):
        job = f"job{j}"
        n = 10 + 5 * j
        ref = rng.randn(n, 3) * 8
        rows += _rows(job, 0, ref)
        for m in (1, 2):
            noisy = (
                ref @ _random_rotation(rng).T
                + rng.randn(3) * 4
                + rng.randn(n, 3) * 0.5
            )
            rows += _rows(job, m, noisy)
            want[(job, m)] = _reference_rmsd(noisy, ref)
    df = spark.createDataFrame(rows, ATOMS_SCHEMA)
    got = {
        (r.job, r.model_id): r.rmsd for r in superimpose_models(df).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_reflection_is_not_allowed(spark):
    """A mirrored structure must NOT align to rmsd 0 — Kabsch restricts
    to proper rotations (det +1), which is the whole point of the sign
    correction."""
    rng = np.random.RandomState(3)
    ref = rng.randn(15, 3) * 6
    mirrored = ref * np.array([-1.0, 1.0, 1.0])
    df = spark.createDataFrame(
        _rows("j1", 0, ref) + _rows("j1", 1, mirrored), ATOMS_SCHEMA
    )
    out = superimpose_models(df).collect()[0]
    assert out.rmsd == pytest.approx(
        _reference_rmsd(mirrored, ref), abs=1e-9
    )
    assert out.rmsd > 0.5


def test_pairing_ignores_unmatched_residues_and_other_atoms(spark):
    """Residues present in only one model drop out of the pairing join;
    non-CA atoms never participate."""
    rng = np.random.RandomState(5)
    ref = rng.randn(12, 3)
    rows = _rows("j1", 0, ref) + _rows("j1", 1, ref)
    # extra residues only in model 1, plus backbone noise atoms
    rows += [("j1", 1, "A", 99, "CA", 1.0, 2.0, 3.0)]
    rows += [("j1", 0, "A", 1, "N", 9.0, 9.0, 9.0)]
    df = spark.createDataFrame(rows, ATOMS_SCHEMA)
    out = superimpose_models(df).collect()[0]
    assert out.n_atoms == 12
    # trace-identity cancellation: exact-zero rmsd surfaces as ~1e-8
    assert out.rmsd == pytest.approx(0.0, abs=1e-6)


def test_chain_filter_and_multi_model(spark):
    rng = np.random.RandomState(11)
    a = rng.randn(10, 3)
    b = rng.randn(8, 3)
    rows = (
        _rows("j1", 0, a, chain="A")
        + _rows("j1", 0, b, chain="B")
        + _rows("j1", 1, a, chain="A")          # chain A identical
        + _rows("j1", 1, b + 2.0, chain="B")    # chain B translated (rmsd 0 too)
        + _rows("j1", 2, a + rng.randn(10, 3), chain="A")
    )
    df = spark.createDataFrame(rows, ATOMS_SCHEMA)
    only_a = {
        (r.model_id): r
        for r in superimpose_models(df, chain_id="A").collect()
    }
    assert only_a[1].n_atoms == 10
    assert only_a[1].rmsd == pytest.approx(0.0, abs=1e-6)
    assert only_a[2].rmsd > 0.1


def test_driver_row_rows_and_schema(spark):
    """The driver row (rows-only check: no SQL oracle for an SVD) —
    rows = (n_models - 1) per job on the fixture corpus, stable
    schema."""
    from process_alphafold3_outputs_spark.plans.driver_queries_af3 import (
        af3_rmsd_overlay,
    )

    df = af3_rmsd_overlay(spark, "/root/testdata/sf0.001")
    assert [f.name for f in df.schema.fields] == [
        "job", "model_id", "n_atoms", "rmsd"
    ]
    rows = df.collect()
    assert len(rows) > 0
    assert all(r.rmsd is not None and r.rmsd >= 0 for r in rows)
    assert all(r.model_id != 0 for r in rows)
