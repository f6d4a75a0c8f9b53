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


def make_corpus(
    n_jobs: int = 20, seed: int = 7, scale: int = 1
) -> dict[str, pd.DataFrame]:
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
        # ``scale`` multiplies chain lengths (pae grows quadratically) —
        # bench corpora use scale>1 so per-job compute resembles real
        # AF3 jobs; planted contact/PAE patterns stay at the same
        # residue positions, so expected outputs are scale-invariant.
        len_a = (14 + i % 6) * scale
        len_b = (12 + i % 5) * scale
        has_ligand = i % 3 == 0
        n_chains = 3 if has_ligand else 2

        # ----- chains (sequence derived from residue names, :156) -----
        res_a = [
            {"residue_id": r + 1, "residue_name": _AA3[rng.randint(20)], "atom_count": 3}
            for r in range(len_a)
        ]
        res_b = [
            {"residue_id": r + 1, "residue_name": _AA3[rng.randint(20)], "atom_count": 3}
            for r in range(len_b)
        ]
        seq_a = "".join(AA_3TO1[r["residue_name"]] for r in res_a)
        seq_b = "".join(AA_3TO1[r["residue_name"]] for r in res_b)
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
        if i % 5 == 1:
            # reversed-direction binder (poi=B, partner=A): PAE is
            # asymmetric, so mat[1][0] and the transposed matrix slice
            # must be exercised independently of mat[0][1]
            mat[1][0] = round(2 + 8 * rng.rand(), 2)
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
        # mid-range block (U[9,14.5]): partner res 11..13 — passes a 15
        # cutoff but fails an 8 cutoff, so parameter sweeps over the pae
        # axis differentiate
        if len_b >= 13:
            m0, m1 = len_a + 10, len_a + 13
            m[0:len_a, m0:m1] = (rng.rand(len_a, m1 - m0) * 5.5 + 9).round(2)
        # reversed-direction block (B rows × A cols) for the i%5==1
        # reversed binders: A tokens 3..9 get low PAE scored by B tokens
        if i % 5 == 1:
            r0, r1 = len_a, len_a + len_b
            m[r0:r1, 2 : min(10, len_a)] = (
                rng.rand(r1 - r0, min(10, len_a) - 2) * 4 + 1
            ).round(2)
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


def write_corpus(
    out_dir: str, n_jobs: int = 20, seed: int = 7, scale: int = 1
) -> dict[str, str]:
    """Write the corpus as one parquet file per table; returns paths."""
    os.makedirs(out_dir, exist_ok=True)
    corpus = make_corpus(n_jobs=n_jobs, seed=seed, scale=scale)
    paths = {}
    for name, df in corpus.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        df.to_parquet(path, index=False)
        paths[name] = path
    return paths


def write_file_corpus(out_dir: str, n_jobs: int = 12, seed: int = 7) -> dict:
    """Materialise the corpus as an actual AF3 directory tree — one
    folder per job with ``{job}_summary_confidences_0.json``,
    ``{job}_full_data_0.json`` and ``{job}_model_{k}.cif`` — plus the
    malformed-input landmines of SURVEY §2.2 #11: an AppleDouble
    ``._*`` file, a corrupt-JSON job, and a latin-1-encoded summary.

    Returns the in-memory corpus dict for differential assertions.
    """
    import json

    from .operators.structures import atoms_to_cif

    corpus = make_corpus(n_jobs=n_jobs, seed=seed)
    preds = corpus["predictions"]
    pae = corpus["pae_long"]
    atoms = corpus["atoms"]

    for rec in preds.to_dict("records"):
        job = rec["job"]
        jdir = os.path.join(out_dir, job)
        os.makedirs(jdir, exist_ok=True)

        doc = {}
        if rec["iptm"] is not None and not pd.isna(rec["iptm"]):
            doc["iptm"] = rec["iptm"]
        if rec["ptm"] is not None and not pd.isna(rec["ptm"]):
            doc["ptm"] = rec["ptm"]
        if rec["chain_pair_pae_min"] is not None:
            doc["chain_pair_pae_min"] = [list(r) for r in rec["chain_pair_pae_min"]]
        with open(os.path.join(jdir, f"{job}_summary_confidences_0.json"), "w") as fh:
            json.dump(doc, fh)

        jp = pae[pae.job == job]
        n = int(jp.aligned_token.max()) + 1
        mat = np.zeros((n, n))
        mat[jp.scored_token.to_numpy(), jp.aligned_token.to_numpy()] = jp.pae.to_numpy()
        with open(os.path.join(jdir, f"{job}_full_data_0.json"), "w") as fh:
            json.dump(
                {
                    "pae": [[round(float(v), 2) for v in row] for row in mat],
                    "token_res_ids": list(range(1, n + 1)),
                },
                fh,
            )

        ja = atoms[atoms.job == job]
        for k in sorted(ja.model_id.unique()):
            rows = ja[ja.model_id == k].sort_values(
                ["chain_id", "residue_id", "atom_name"]
            )
            with open(os.path.join(jdir, f"{job}_model_{k}.cif"), "w") as fh:
                fh.write(atoms_to_cif(f"{job}_model_{k}", rows.to_dict("records")))

    # --- landmines ------------------------------------------------------
    j0 = _job_name(0)
    with open(os.path.join(out_dir, j0, f"._{j0}_summary_confidences_0.json"), "wb") as fh:
        fh.write(b"\x00\x05\x16\x07AppleDouble junk")
    cdir = os.path.join(out_dir, "corrupt_json_job")
    os.makedirs(cdir, exist_ok=True)
    with open(os.path.join(cdir, "corrupt_json_job_summary_confidences_0.json"), "w") as fh:
        fh.write("{this is not json")
    ldir = os.path.join(out_dir, "latin1_job")
    os.makedirs(ldir, exist_ok=True)
    with open(os.path.join(ldir, "latin1_job_summary_confidences_0.json"), "wb") as fh:
        fh.write(
            '{"iptm": 0.9, "ptm": 0.8, "note": "caf\xe9", '
            '"chain_pair_pae_min": [[1.0, 3.0], [4.0, 5.0]]}'.encode("latin-1")
        )
    return corpus


def write_expected_parsed(out_dir: str, corpus: dict) -> dict[str, str]:
    """Expected-content tables for the FILE-BOUNDARY oracle queries
    (driver_queries_files): what a correct parse of the file tree
    written by :func:`write_file_corpus` must yield, derived from the
    same in-memory corpus (plus the landmine files' known content) —
    NOT from the engine's own readers.

    DuckDB reads these parquet files as the oracle side; the Spark side
    reads the actual file tree through the real sources/sinks.
    """
    os.makedirs(out_dir, exist_ok=True)
    paths = {}

    preds = corpus["predictions"][["job", "iptm", "ptm", "chain_pair_pae_min"]].copy()
    # the latin-1 landmine is valid JSON in disguise — the encoding
    # fallback must recover exactly this row (write_file_corpus bytes)
    latin1 = pd.DataFrame(
        [
            {
                "job": "latin1_job",
                "iptm": 0.9,
                "ptm": 0.8,
                "chain_pair_pae_min": [[1.0, 3.0], [4.0, 5.0]],
            }
        ]
    )
    preds = pd.concat([preds, latin1], ignore_index=True)

    # summary files the JSON scan must REJECT (O35 errors table): the
    # corrupt-JSON landmine and the latin-1 file (invalid utf-8 for the
    # JVM parser; recovered later by the Python fallback)
    errors = pd.DataFrame(
        {
            "fname": [
                "corrupt_json_job_summary_confidences_0.json",
                "latin1_job_summary_confidences_0.json",
            ]
        }
    )

    tables = {
        "predictions_expected": preds,
        "pae_long_expected": corpus["pae_long"],
        "atoms_expected": corpus["atoms"],
        "chains_expected": corpus["chains"][
            ["job", "chain_id", "chain_index", "token_length", "sequence"]
        ],
        "errors_expected": errors,
    }
    for name, df in tables.items():
        p = os.path.join(out_dir, f"{name}.parquet")
        df.to_parquet(p, index=False)
        paths[name] = p
    return paths
