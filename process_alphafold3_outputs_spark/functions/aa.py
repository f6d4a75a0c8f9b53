"""Amino-acid scalar helpers (O12 — dictionary lookup with default,
process_af3_outputs.py:178-183)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..params import AA_3TO1, AA_DEFAULT

def aa_map() -> Column:
    """Literal MAP<3-letter, 1-letter> — constant-folded by Catalyst.
    Built lazily: Column construction needs an active SparkContext."""
    return F.create_map(*[F.lit(x) for kv in AA_3TO1.items() for x in kv])


def one_letter(resname: Column | str) -> Column:
    """3-letter residue name -> 1-letter code, 'X' default (:156)."""
    c = F.col(resname) if isinstance(resname, str) else resname
    return F.coalesce(aa_map()[c], F.lit(AA_DEFAULT))


def is_standard_aa(resname: Column | str) -> Column:
    """True for the 20 standard amino acids (:165, :230-231)."""
    c = F.col(resname) if isinstance(resname, str) else resname
    return c.isin(list(AA_3TO1))


def token_weight(resname: Column | str, atom_count: Column | str) -> Column:
    """AF3 token rule (:165-168): standard AA counts 1, anything else
    counts its atoms (ligands/ions)."""
    a = F.col(atom_count) if isinstance(atom_count, str) else atom_count
    return F.when(is_standard_aa(resname), F.lit(1)).otherwise(a)
