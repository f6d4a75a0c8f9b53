"""mmCIF structure source — O9/O10 (process_af3_outputs.py:36-64, :126-176).

The one genuinely non-relational boundary in the reference: CIF bytes →
atom rows. Expressed as ``binaryFile`` scan + Arrow-batched
``mapInPandas`` running a minimal pure-Python ``_atom_site`` loop parser
(the mmCIF loop format is public PDBx/mmCIF spec; no Biopython needed —
the container doesn't ship it, and a 30-line tokenizer beats a full
parser for the hot path).

Reference parity:
  - encodings utf-8 → iso-8859-1 fallback (:47-61); Spark task retries
    replace the 3×1 s sleep loop
  - unparseable file ⇒ zero rows for that file, never a failed query
    (SURVEY §2.2 #11)
  - chain id = auth_asym_id, residue id = auth_seq_id (Biopython's
    ``chain.id`` / ``residue.id[1]``), residue name = label_comp_id
  - model_id parsed from the ``*_model_{k}.cif`` filename (O32, :440-441)

Scale: each CIF is one row of the binaryFile scan; parsing is
embarrassingly parallel, and the resulting ``atoms`` table is written
partitioned by job bucket for downstream co-location.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..params import AA_3TO1

ATOMS_SCHEMA = (
    "job string, model_id int, chain_id string, residue_id int, "
    "residue_name string, is_aa boolean, atom_name string, "
    "x double, y double, z double"
)

from ._cif_core import (  # noqa: F401 — _tokens re-exported for tests
    ATOM_COLUMNS,
    _tokens,
    parse_atom_site_columns,
)


def parse_atom_site(text: str) -> list[dict]:
    """Parse every ``_atom_site`` loop in an mmCIF document into atom
    dicts — the row-form compatibility wrapper over the COLUMNAR core
    (:mod:`._cif_core`, ~10× the r7 row parser's atoms/s/core; the
    mapInPandas ingest path consumes the columns directly and never
    pays the per-atom dict built here)."""
    cols = parse_atom_site_columns(text)
    plain = {
        k: (v.tolist() if hasattr(v, "tolist") else v)
        for k, v in cols.items()
    }
    return [
        dict(zip(ATOM_COLUMNS, vals))
        for vals in zip(*(plain[k] for k in ATOM_COLUMNS))
    ]


def _decode(content: bytes) -> str | None:
    """Encoding fallback chain of the reference (:47-61)."""
    for enc in ("utf-8", "iso-8859-1"):
        try:
            return content.decode(enc)
        except UnicodeDecodeError:
            continue
    return None


_JOB_RE = re.compile(r"^.*/([^/]+)/[^/]+$")
#: AF3 names models ``{job}_model_{k}.cif``; overlay sinks write
#: ``{job}/model_{k}.cif`` — accept either separator before "model_".
_MODEL_RE = re.compile(r"(?:^|[_/])model_(\d+)\.cif$")


def read_atoms(
    spark: SparkSession,
    input_dir: str,
    glob: str = "*_model_*.cif",
    job_from_filename: str | None = None,
) -> DataFrame:
    """``atoms`` table from all model CIFs under ``input_dir``.

    ``job_from_filename``: optional regex with one capture group applied
    to the file BASENAME to extract the job key (for flat sink layouts
    like ``{job}_interaction.cif``); default takes the parent directory
    name (the AF3 input layout, :348)."""
    files = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", glob)
        .load(input_dir)
        .filter(~F.col("path").rlike(r"/\._"))
        .select("path", "content")
    )

    job_re = re.compile(job_from_filename) if job_from_filename else None

    def parse_partition(batches) -> Iterator:
        import os as _os

        import pandas as pd

        out_cols = [
            "job", "model_id", "chain_id", "residue_id", "residue_name",
            "is_aa", "atom_name", "x", "y", "z",
        ]
        for pdf in batches:
            frames = []
            for path, content in zip(pdf["path"], pdf["content"]):
                if job_re is not None:
                    m_job = job_re.match(_os.path.basename(path))
                else:
                    m_job = _JOB_RE.match(path)
                m_model = _MODEL_RE.search(path)
                text = _decode(bytes(content))
                if not m_job or text is None:
                    continue
                model_id = int(m_model.group(1)) if m_model else 0
                # columnar core → columnar frame: never pays a Python
                # dict per atom (the scalar job/model_id broadcast)
                c = parse_atom_site_columns(text)
                if not c["chain_id"]:
                    continue
                frames.append(
                    pd.DataFrame({"job": m_job.group(1),
                                  "model_id": model_id, **c})
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)[out_cols]
            else:
                yield pd.DataFrame(columns=out_cols)

    return files.mapInPandas(parse_partition, ATOMS_SCHEMA)


def chains_from_atoms(atoms: DataFrame, model_id: int = 0) -> DataFrame:
    """Derive the ``chains`` table (O11-O14, :153-174) from parsed atoms:
    per (job, chain): ordered one-letter sequence ('X' default), token
    length (+1 per standard AA, +atom_count otherwise — the AF3 token
    rule, :165-168), and the ordered residue list.

    Pure built-in aggregation: collect_list is shuffle-nondeterministic,
    so every ordered collect goes through sort_array(struct(...)).
    """
    from ..functions.aa import one_letter, token_weight

    residues = (
        atoms.filter(F.col("model_id") == model_id)
        .groupBy("job", "chain_id", "residue_id", "residue_name")
        .agg(F.count(F.lit(1)).alias("atom_count"))
    )
    residues = residues.withColumn("_letter", one_letter("residue_name"))
    per_chain = residues.groupBy("job", "chain_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("residue_id", "_letter"))),
                lambda s: s._letter,
            ),
        ).alias("sequence"),
        F.sum(token_weight("residue_name", "atom_count")).cast("int").alias("token_length"),
        F.array_sort(
            F.collect_list(F.struct("residue_id", "residue_name", "atom_count"))
        ).alias("residues"),
    )
    # chain_index = position of the chain in structure order; AF3 labels
    # chains A,B,C,... so lexicographic chain_id order == structure order
    # (the reference conflates the two as well — SURVEY §2.2 #2).
    w_idx = Window.partitionBy("job").orderBy("chain_id")
    return per_chain.withColumn(
        "chain_index", (F.row_number().over(w_idx) - 1).cast("int")
    ).select(
        "job", "chain_id", "chain_index", "token_length", "sequence", "residues"
    )
