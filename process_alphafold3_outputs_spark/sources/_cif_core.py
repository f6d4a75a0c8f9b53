"""Columnar mmCIF ``_atom_site`` parser core.

This is the engine's one mandatory Python parse island (SURVEY §7.2):
CIF bytes → atom rows cannot be expressed relationally, so its
single-core constant factor IS the CIF ingest rate at 100 TB. The core
therefore avoids per-line and per-atom Python work wherever the format
allows:

- loop blocks are located with compiled-regex scans over the RAW text
  (no ``splitlines`` of the whole document, no strip/startswith per
  data line);
- the whole data block is tokenized with ONE C-level ``str.split`` (an
  alignment guard drops the block to a per-line loop when a malformed
  or quoted line breaks the rows × columns token count);
- numeric columns convert via ``numpy.asarray(..., dtype=...)`` — C
  parsing loops instead of a Python ``int()``/``float()`` per token;
- the Arrow/pandas consumer builds its DataFrame straight from the
  columns (a list-of-dicts frame re-pays a dict per atom).

Measured on a 100 k-atom synthetic document (NOTES r8): 0.17 M
atoms/s/core for the r7 regex-per-line row parser → ~0.8 M
atoms/s/core for this core (the compat row wrapper in
``cif.parse_atom_site`` adds the dict cost back for its direct callers
— tests and small inputs).

Row-drop semantics are unchanged from the reference parity contract
(process_af3_outputs.py:126-176 — SURVEY §2.2 #11): a malformed row is
dropped, never a failed file; a loop block missing a required header
contributes nothing.
"""

from __future__ import annotations

import re

import numpy as np

from ..params import AA_3TO1

ATOM_COLUMNS = (
    "chain_id", "residue_id", "residue_name", "is_aa", "atom_name",
    "x", "y", "z",
)

_TOKEN_RE = re.compile(r"'(?:[^']*)'|\"(?:[^\"]*)\"|\S+")

#: a ``loop_`` keyword on its own line
_LOOP_RE = re.compile(r"^[ \t]*loop_[ \t]*\r?$", re.M)
#: a header line (``_category.item``) — anchored scan from a position
_HEADER_RE = re.compile(r"[ \t]*(_\S+)[^\n]*\n")
#: first line that TERMINATES a data block: empty/whitespace-only, or
#: starting (after indent) with #, _, loop_, or data_
_BLOCK_END_RE = re.compile(
    r"^[ \t]*(?:#|_|loop_|data_|\r?$)", re.M
)


def _tokens(line: str) -> list[str]:
    return [t[1:-1] if t[:1] in "'\"" else t for t in _TOKEN_RE.findall(line)]


def _empty_columns() -> dict[str, list]:
    return {k: [] for k in ATOM_COLUMNS}


def parse_atom_site_columns(text: str) -> dict[str, list]:
    """Parse every ``_atom_site`` loop of an mmCIF document into a
    column dict (equal-length sequences keyed by :data:`ATOM_COLUMNS`;
    numeric columns come back as numpy arrays — zero-copy into the
    Arrow batch — string/bool columns as lists)."""
    cols = _empty_columns()
    # numeric columns accumulate as numpy CHUNKS (one per fast-path
    # block) and concatenate once at the end — the tolist()/extend
    # round-trip per value measured ~0.4 µs/atom, a third of the budget
    num_chunks: dict[str, list] = {"residue_id": [], "x": [], "y": [], "z": []}
    pos = 0
    n = len(text)
    while pos < n:
        m_loop = _LOOP_RE.search(text, pos)
        if m_loop is None:
            break
        pos = m_loop.end() + 1
        # header lines: consecutive ``_name`` lines after loop_
        headers: list[str] = []
        while pos < n:
            m_h = _HEADER_RE.match(text, pos)
            if m_h is None:
                break
            headers.append(m_h.group(1))
            pos = m_h.end()
        if not headers or not headers[0].startswith("_atom_site."):
            continue
        idx = {h.split(".", 1)[1]: k for k, h in enumerate(headers)}
        chain_f = "auth_asym_id" if "auth_asym_id" in idx else "label_asym_id"
        res_f = "auth_seq_id" if "auth_seq_id" in idx else "label_seq_id"
        # hoisted once per loop block: a block missing a required field
        # skips ALL its rows (same net behavior the old per-row
        # KeyError produced)
        try:
            ic, ir = idx[chain_f], idx[res_f]
            inm, ia = idx["label_comp_id"], idx["label_atom_id"]
            ix, iy, iz = idx["Cartn_x"], idx["Cartn_y"], idx["Cartn_z"]
        except KeyError:
            continue
        nh = len(headers)
        # data block: everything up to the first terminator line — one
        # compiled-regex scan, no per-line Python
        m_end = _BLOCK_END_RE.search(text, pos)
        end = m_end.start() if m_end else n
        block = text[pos:end]
        pos = end
        if not block.strip():
            continue
        nlines = block.count("\n")
        if not block.endswith("\n"):
            nlines += 1
        done = False
        if "'" not in block and '"' not in block:
            flat = block.split()
            # alignment guard: take the strided view only when the
            # token count is exactly rows × columns; any malformed
            # line breaks the equality and the block drops to the
            # per-line path (compensating misalignments additionally
            # have to survive the numeric conversions below)
            if len(flat) == nh * nlines:
                try:
                    rid = np.asarray(flat[ir::nh], dtype=np.int64)
                    xs = np.asarray(flat[ix::nh], dtype=np.float64)
                    ys = np.asarray(flat[iy::nh], dtype=np.float64)
                    zs = np.asarray(flat[iz::nh], dtype=np.float64)
                except ValueError:
                    pass  # some numeric token malformed: per-line path
                else:
                    rn = flat[inm::nh]
                    cols["chain_id"].extend(flat[ic::nh])
                    num_chunks["residue_id"].append(rid)
                    cols["residue_name"].extend(rn)
                    cols["is_aa"].extend([v in AA_3TO1 for v in rn])
                    cols["atom_name"].extend(flat[ia::nh])
                    num_chunks["x"].append(xs)
                    num_chunks["y"].append(ys)
                    num_chunks["z"].append(zs)
                    done = True
        if done:
            continue
        # slow path: quoted fields or a malformed line somewhere in
        # the block — tokenize per line, drop rows that don't parse
        # (numeric values land in per-block lists so block order is
        # preserved in the chunk streams)
        b_rid: list[int] = []
        b_x: list[float] = []
        b_y: list[float] = []
        b_z: list[float] = []
        for s in block.splitlines():
            s = s.strip()
            if not s:
                continue
            row = s.split() if "'" not in s and '"' not in s else _tokens(s)
            if len(row) < nh:
                continue  # malformed row: drop, don't fail
            try:
                resname = row[inm]
                rid_v = int(row[ir])
                x_v, y_v, z_v = float(row[ix]), float(row[iy]), float(row[iz])
            except ValueError:
                continue
            cols["chain_id"].append(row[ic])
            b_rid.append(rid_v)
            cols["residue_name"].append(resname)
            cols["is_aa"].append(resname in AA_3TO1)
            cols["atom_name"].append(row[ia])
            b_x.append(x_v)
            b_y.append(y_v)
            b_z.append(z_v)
        if b_rid:
            num_chunks["residue_id"].append(np.asarray(b_rid, dtype=np.int64))
            num_chunks["x"].append(np.asarray(b_x, dtype=np.float64))
            num_chunks["y"].append(np.asarray(b_y, dtype=np.float64))
            num_chunks["z"].append(np.asarray(b_z, dtype=np.float64))
    for k, chunks in num_chunks.items():
        if not chunks:
            cols[k] = []
        elif len(chunks) == 1:
            cols[k] = chunks[0]
        else:
            cols[k] = np.concatenate(chunks)
    return cols
