"""File-based sources + sinks: AF3 directory tree → engine tables →
pipeline → CIF/PyMOL outputs, differentially checked against the
pure-Python model and the in-memory corpus."""

from __future__ import annotations

import os

import pytest

from process_alphafold3_outputs_spark.fixtures import write_file_corpus
from process_alphafold3_outputs_spark.operators.structures import (
    pymol_scripts,
    write_interaction_cifs,
    write_overlay_models,
)
from process_alphafold3_outputs_spark.params import ScreenParams
from process_alphafold3_outputs_spark.plans.pipeline import (
    interaction_report,
    two_level_islands,
)
from process_alphafold3_outputs_spark.sources.af3_json import (
    read_pae_long,
    read_summary_confidences,
)
from process_alphafold3_outputs_spark.sources.cif import chains_from_atoms, read_atoms

from . import reference_model as model

PARAMS = ScreenParams()
N_JOBS = 12


@pytest.fixture(scope="module")
def file_corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("af3files"))
    corpus = write_file_corpus(d, n_jobs=N_JOBS, seed=7)
    return d, corpus


def test_summary_scan_prunes_and_falls_back(spark, file_corpus):
    d, corpus = file_corpus
    preds = read_summary_confidences(spark, d)
    rows = {r.job: r for r in preds.collect()}
    # corrupt json dropped; AppleDouble junk never read; latin-1 recovered
    assert "corrupt_json_job" not in rows
    assert "latin1_job" in rows
    assert rows["latin1_job"].iptm == 0.9
    # every real job present with its iptm (None where key omitted)
    import pandas as pd

    for rec in corpus["predictions"].to_dict("records"):
        assert rec["job"] in rows
        got = rows[rec["job"]].iptm
        missing = rec["iptm"] is None or pd.isna(rec["iptm"])
        assert (got is None) == missing
        if not missing:
            assert abs(got - rec["iptm"]) < 1e-12


def test_pae_long_roundtrip(spark, file_corpus):
    d, corpus = file_corpus
    pae = read_pae_long(spark, d)
    jp = corpus["pae_long"]
    job = "fold_poi_partner_0002"
    got = {
        (r.scored_token, r.aligned_token): r.pae
        for r in pae.filter(pae.job == job).collect()
    }
    want = {
        (int(r.scored_token), int(r.aligned_token)): float(r.pae)
        for r in jp[jp.job == job].itertuples()
    }
    assert got == want


def test_cif_atoms_roundtrip(spark, file_corpus):
    d, corpus = file_corpus
    atoms = read_atoms(spark, d)
    ja = corpus["atoms"]
    got = {
        (r.job, r.model_id, r.chain_id, r.residue_id, r.atom_name): (
            r.residue_name,
            r.is_aa,
            round(r.x, 3),
        )
        for r in atoms.collect()
    }
    want = {
        (r.job, int(r.model_id), r.chain_id, int(r.residue_id), r.atom_name): (
            r.residue_name,
            bool(r.is_aa),
            round(float(r.x), 3),
        )
        for r in ja.itertuples()
    }
    assert got == want


def test_chains_from_atoms_token_rule(spark, file_corpus):
    d, corpus = file_corpus
    chains = chains_from_atoms(read_atoms(spark, d))
    got = {
        (r.job, r.chain_id): (r.chain_index, r.token_length, r.sequence)
        for r in chains.collect()
    }
    for r in corpus["chains"].itertuples():
        assert got[(r.job, r.chain_id)] == (
            int(r.chain_index),
            int(r.token_length),
            r.sequence,
        )


def test_end_to_end_from_files_matches_model(spark, file_corpus, tmp_path):
    d, corpus = file_corpus
    preds = read_summary_confidences(spark, d)
    atoms = read_atoms(spark, d)
    chains = chains_from_atoms(atoms)
    pae = read_pae_long(spark, d)
    report = interaction_report(preds, chains, pae, atoms, PARAMS)
    cols = PARAMS.report_columns()
    got = {tuple(r[c] for c in cols) for r in report.collect()}
    want = set(model.full_pipeline(corpus))
    assert got == want and len(want) > 0


def test_structure_sinks_and_pymol(spark, file_corpus, tmp_path):
    d, corpus = file_corpus
    atoms = read_atoms(spark, d)
    # islands members for sink selection, from the grid-contact path
    from process_alphafold3_outputs_spark.operators.intervals import (
        identify_interacting_residues,
    )
    from process_alphafold3_outputs_spark.operators.islands import find_islands
    from process_alphafold3_outputs_spark.operators.screen import screen_binders
    from process_alphafold3_outputs_spark.operators.spatial import contact_pairs_grid
    from process_alphafold3_outputs_spark.sources.af3_json import read_pae_long

    preds = read_summary_confidences(spark, d)
    chains = chains_from_atoms(atoms)
    pae = read_pae_long(spark, d)
    binders = screen_binders(preds, PARAMS)
    inter = identify_interacting_residues(pae, chains, PARAMS, jobs=binders)
    contacts = contact_pairs_grid(atoms, inter, PARAMS)
    partner_islands = find_islands(
        contacts.select("job", "partner_res").distinct(),
        ["job"], "partner_res", 1, 3, island_col="p_isl",
    ).select("job", "partner_res")

    out1 = str(tmp_path / PARAMS.interaction_dir())
    written = write_interaction_cifs(atoms, partner_islands, out1, PARAMS).collect()
    assert all(w.path.endswith("_interaction.cif") for w in written)
    assert len(written) > 0

    # re-read one trimmed CIF: retained residues = POI ∪ island members (O30)
    w0 = sorted(written, key=lambda w: w.path)[0]
    job = os.path.basename(w0.path).removesuffix("_interaction.cif")
    keep = {
        (r.job, r.partner_res) for r in partner_islands.collect() if r.job == job
    }
    orig = corpus["atoms"]
    want_res = set()
    for r in orig[(orig.job == job) & (orig.model_id == 0)].itertuples():
        if r.chain_id == "A" or (r.chain_id == "B" and (job, r.residue_id) in keep):
            want_res.add((r.chain_id, int(r.residue_id)))

    from process_alphafold3_outputs_spark.sources.cif import parse_atom_site

    with open(w0.path) as fh:
        parsed = parse_atom_site(fh.read())
    assert {(a["chain_id"], a["residue_id"]) for a in parsed} == want_res

    # overlays: model fan-out writes model_0.cif and model_1.cif per binder job
    out2 = str(tmp_path / PARAMS.overlay_dir())
    overlay = write_overlay_models(atoms, partner_islands, out2, PARAMS).collect()
    ks = {os.path.basename(w.path) for w in overlay}
    assert ks == {"model_0.cif", "model_1.cif"}
    with open(sorted(overlay, key=lambda w: w.path)[0].path) as fh:
        relabelled = parse_atom_site(fh.read())
    assert {a["chain_id"] for a in relabelled} <= {"A", "B"}

    # PyMOL codegen per job
    files = spark.createDataFrame(
        [(os.path.basename(os.path.dirname(w.path)), w.path) for w in overlay],
        "job string, path string",
    )
    scripts = pymol_scripts(files, out2).collect()
    assert len(scripts) > 0
    with open(scripts[0].path) as fh:
        text = fh.read()
    assert "load " in text and "align model_1 and chain A, model_0 and chain A" in text
    assert "util.cbc()" in text and "_overlay.pse" in text


def test_fallback_parse_coerces_bad_types_instead_of_aborting(spark, tmp_path):
    """Type-mismatched summary files (string iptm, mixed-type pae
    matrix) route to the Python fallback — which must coerce them to
    NULLs, not crash the whole query with an Arrow schema error
    ('malformed inputs drop rows, never queries')."""
    import json

    d = str(tmp_path / "badtypes")
    jdir = os.path.join(d, "stringy_job")
    os.makedirs(jdir)
    with open(os.path.join(jdir, "stringy_job_summary_confidences_0.json"), "w") as fh:
        json.dump(
            {
                "iptm": "very high",
                "ptm": 0.5,
                "chain_pair_pae_min": [[1.0, "oops"], [2.0, 3.0]],
            },
            fh,
        )
    gdir = os.path.join(d, "good_job")
    os.makedirs(gdir)
    with open(os.path.join(gdir, "good_job_summary_confidences_0.json"), "w") as fh:
        json.dump(
            {"iptm": 0.7, "ptm": 0.6, "chain_pair_pae_min": [[1.0, 2.0], [3.0, 4.0]]},
            fh,
        )
    rows = {r.job: r for r in read_summary_confidences(spark, d).collect()}
    assert rows["good_job"].iptm == 0.7
    assert "stringy_job" in rows  # recovered, not aborted
    assert rows["stringy_job"].iptm is None  # coerced
    assert rows["stringy_job"].ptm == 0.5
    m = rows["stringy_job"].chain_pair_pae_min
    assert m[0][0] == 1.0 and m[0][1] is None and m[1][1] == 3.0


def test_csv_roundtrip_survives_embedded_newlines(spark, tmp_path):
    """file_roundtrip_csv's re-read must parse a QUOTED value holding
    an embedded newline as one row (advice r11: without multiLine the
    reader splits records on raw line breaks — a newline-bearing text
    value silently became two rows). Hostile values: newline, CRLF,
    quote, comma, all in one corpus."""
    from process_alphafold3_outputs_spark.plans.driver_queries_files import (
        file_roundtrip_csv,
    )

    sf_dir = str(tmp_path / "sf")
    rows = [
        (1, "plain", "en", "web", 5),
        (2, "line one\nline two", "en", "web", 17),
        (3, "crlf\r\nafter", "de", "book", 11),
        (4, 'quoted "middle" text', "fr", "web", 20),
        (5, "comma, separated, stuff", "en", "code", 23),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long"
    ).write.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r.doc_id: (r.text, r.lang, r.source, r.n_chars)
        for r in file_roundtrip_csv(spark, sf_dir).collect()
    }
    want = {d: (t, la, s, n) for d, t, la, s, n in rows}
    assert got == want
