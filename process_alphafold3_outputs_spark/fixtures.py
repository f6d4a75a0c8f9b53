"""Deterministic synthetic AF3 corpus generator (FIXTURES.md schemas).

Generates the four AF3-shaped tables — ``predictions``, ``chains``,
``pae_long``, ``atoms`` — as pandas DataFrames / parquet files, with
planted structure that exercises every semantic trap in SURVEY §2.2:
boundary iptm/pae values, ragged pae matrices, unknown chain labels,
ligand token counting, contact runs that pass/fail the island
parameters.

Pure pandas/pyarrow (no Spark dependency) so tests can build corpora
cheaply; everything is a function of (seed, n_jobs) — no global state.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from .params import AA_3TO1

_AA3 = sorted(AA_3TO1.keys())

#: per-residue backbone atoms used for synthetic structures
_ATOM_NAMES = ("N", "CA", "C")


def _job_name(i: int) -> str:
    return f"fold_poi_partner_{i:04d}"


def make_corpus(n_jobs: int = 20, seed: int = 7) -> dict[str, pd.DataFrame]:
    """Build the 4-table corpus. Job ``i`` layout:

    - chains: A (POI, 14 + i%6 AA residues), B (partner, 12 + i%5),
      plus for i%3==0 a ligand chain C (1 LIG residue, 6 atoms ⇒
      token_length 6 — the token rule of :165-168).
    - screen: i%2==0 ⇒ pae_min[A][B] < 15 (binder candidate); i%10==0
      ⇒ iptm NULL (defaults to 0, passes iptm>=0); i%17==0 ⇒ ragged
      pae_min matrix (OOB ⇒ reject); i%8==6 ⇒ pae_min exactly 15.0
      (boundary ⇒ reject).
    - pae matrix: background ~U[16,31]; for binders a low block
      (U[1,5]) over POI rows × partner-token columns for partner
      residues 3..10, and a too-thin block (only min_residues-1 POI
      rows) for partner residues 14..16 which must NOT survive the
      count threshold.
    - atoms (models 0 and 1): POI residue r at x=3.0*r on the x-axis;
      partner residues 3..8 placed 4 Å above POI residues (contact run
      that survives islands), 10..11 in contact (run too short,
      len<3), rest 500 Å away.
    """
    rng = np.random.RandomState(seed)
    pred_rows, chain_rows, pae_rows, atom_rows = [], [], [], []

    for i in range(n_jobs):
        job = _job_name(i)
        len_a = 14 + i % 6
        len_b = 12 + i % 5
        has_ligand = i % 3 == 0
        n_chains = 3 if has_ligand else 2

        # ----- chains -------------------------------------------------
        seq_a = "".join(rng.choice(list("ACDEFGHIKLMNPQRSTVWY"), len_a))
        seq_b = "".join(rng.choice(list("ACDEFGHIKLMNPQRSTVWY"), len_b))
        res_a = [
            {"residue_id": r + 1, "residue_name": _AA3[rng.randint(20)], "atom_count": 3}
            for r in range(len_a)
        ]
        res_b = [
            {"residue_id": r + 1, "residue_name": _AA3[rng.randint(20)], "atom_count": 3}
            for r in range(len_b)
        ]
        chain_rows.append(
            dict(job=job, chain_id="A", chain_index=0, token_length=len_a,
                 sequence=seq_a, residues=res_a)
        )
        chain_rows.append(
            dict(job=job, chain_id="B", chain_index=1, token_length=len_b,
                 sequence=seq_b, residues=res_b)
        )
        if has_ligand:
            chain_rows.append(
                dict(job=job, chain_id="C", chain_index=2, token_length=6,
                     sequence="X",
                     residues=[{"residue_id": 1, "residue_name": "LIG", "atom_count": 6}])
            )

        # ----- predictions (screen input) -----------------------------
        iptm = None if i % 10 == 0 else round(0.2 + 0.6 * rng.rand(), 3)
        ptm = None if i % 10 == 5 else round(0.2 + 0.6 * rng.rand(), 3)
        k = n_chains
        mat = (rng.rand(k, k) * 10 + 16).round(2)
        if i % 2 == 0:
            mat[0][1] = round(2 + 10 * rng.rand(), 2)
        if i % 8 == 6:
            mat[0][1] = 15.0  # boundary: >= cutoff ⇒ reject (:102)
        pae_min: list[list[float]] | None = [list(map(float, row)) for row in mat]
        if i % 17 == 0 and i > 0:
            pae_min = [pae_min[0][:1]]  # ragged ⇒ OOB ⇒ reject (:96-100)
        pred_rows.append(
            dict(job=job, iptm=iptm, ptm=ptm, chain_pair_pae_min=pae_min,
                 n_chains=n_chains)
        )

        # ----- pae_long ----------------------------------------------
        n_tokens = len_a + len_b + (6 if has_ligand else 0)
        m = (rng.rand(n_tokens, n_tokens) * 15 + 16).round(2)  # [16,31)
        # low block: POI rows 0..len_a-1 × partner residues 3..10
        lo, hi = len_a + 2, len_a + min(10, len_b)  # cols for partner res 3..10
        m[0:len_a, lo:hi] = (rng.rand(len_a, hi - lo) * 4 + 1).round(2)
        # thin block (min_residues-1 = 4 POI rows): partner res 14..16
        if len_b >= 16:
            t0, t1 = len_a + 13, len_a + 16
            m[0:4, t0:t1] = 2.0
        si, ai = np.meshgrid(np.arange(n_tokens), np.arange(n_tokens), indexing="ij")
        pae_rows.append(
            pd.DataFrame(
                {
                    "job": job,
                    "scored_token": si.ravel().astype(np.int32),
                    "aligned_token": ai.ravel().astype(np.int32),
                    "pae": m.ravel().astype(np.float32),
                }
            )
        )

        # ----- atoms (models 0, 1) ------------------------------------
        contact_res = set(range(3, 9)) | {10, 11}
        for model_id in (0, 1):
            jitter = 0.0 if model_id == 0 else 0.05
            for r in range(1, len_a + 1):
                for ai_, an in enumerate(_ATOM_NAMES):
                    atom_rows.append(
                        dict(job=job, model_id=model_id, chain_id="A",
                             residue_id=r, residue_name=res_a[r - 1]["residue_name"],
                             is_aa=True, atom_name=an,
                             x=3.0 * r + 0.4 * ai_ + jitter, y=0.0, z=0.0)
                    )
            for r in range(1, len_b + 1):
                near = r in contact_res
                y = 4.0 if near else 500.0
                for ai_, an in enumerate(_ATOM_NAMES):
                    atom_rows.append(
                        dict(job=job, model_id=model_id, chain_id="B",
                             residue_id=r, residue_name=res_b[r - 1]["residue_name"],
                             is_aa=True, atom_name=an,
                             x=3.0 * r + 0.4 * ai_ + jitter, y=y, z=0.0)
                    )
            if has_ligand:
                for ai_ in range(6):
                    atom_rows.append(
                        dict(job=job, model_id=model_id, chain_id="C",
                             residue_id=1, residue_name="LIG", is_aa=False,
                             atom_name=f"C{ai_}", x=100.0 + ai_, y=100.0, z=100.0)
                    )

    return {
        "predictions": pd.DataFrame(pred_rows),
        "chains": pd.DataFrame(chain_rows),
        "pae_long": pd.concat(pae_rows, ignore_index=True),
        "atoms": pd.DataFrame(atom_rows),
    }


def write_corpus(out_dir: str, n_jobs: int = 20, seed: int = 7) -> dict[str, str]:
    """Write the corpus as one parquet file per table; returns paths."""
    os.makedirs(out_dir, exist_ok=True)
    corpus = make_corpus(n_jobs=n_jobs, seed=seed)
    paths = {}
    for name, df in corpus.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        df.to_parquet(path, index=False)
        paths[name] = path
    return paths
