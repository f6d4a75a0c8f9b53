"""Query parameters + semantic constants of the reference engine.

Every comparison-strictness / indexing / island-parameter decision from
SURVEY.md §2.2 lives here so no refactor can drift. Citations point at
``/root/reference/process_af3_outputs.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

#: Valid chain-label domain (process_af3_outputs.py:89, :186). Labels
#: outside A–E reject the whole job.
CHAIN_DOMAIN: tuple[str, ...] = ("A", "B", "C", "D", "E")

#: Chain label -> 0-based index into chain_pair_pae_min (":89-94").
CHAIN_TO_INDEX: dict[str, int] = {c: i for i, c in enumerate(CHAIN_DOMAIN)}

#: 3-letter -> 1-letter amino-acid codes (process_af3_outputs.py:178-183);
#: anything absent maps to 'X' (:156). These 20 also define ``is_aa`` for
#: the token rule (:165-168) and the contact filter (:230-231).
AA_3TO1: dict[str, str] = {
    "ALA": "A", "ARG": "R", "ASN": "N", "ASP": "D", "CYS": "C",
    "GLN": "Q", "GLU": "E", "GLY": "G", "HIS": "H", "ILE": "I",
    "LEU": "L", "LYS": "K", "MET": "M", "PHE": "F", "PRO": "P",
    "SER": "S", "THR": "T", "TRP": "W", "TYR": "Y", "VAL": "V",
}
AA_DEFAULT = "X"

#: Island parameters per level (SURVEY §2.2 #6):
#: partner-residue islands (process_af3_outputs.py:292)
PARTNER_ISLAND_MAX_GAP = 1
PARTNER_ISLAND_MIN_LENGTH = 3
#: POI contact islands over the per-partner-island set union (:299)
POI_ISLAND_MAX_GAP = 2
POI_ISLAND_MIN_LENGTH = 3


@dataclass(frozen=True)
class ScreenParams:
    """The reference CLI's 8 query parameters (process_af3_outputs.py:582-590).

    Strictness contract (SURVEY §2.2 #1):
      - iptm/ptm: pass when ``>= cutoff`` (equality passes, :86)
      - pae: pass only when strictly ``< cutoff`` (:102, :218)
      - residue count: pass when ``>= min_residues`` (:218)
    """

    poi_chain: str = "A"
    partner_chain: str = "B"
    max_pae_cutoff: float = 15.0
    min_iptm_cutoff: float = 0.0
    min_ptm_cutoff: float = 0.0
    min_residues_cutoff: int = 5
    max_dist: float = 8.0

    def report_columns(self) -> list[str]:
        """CSV header; two names embed chain params (process_af3_outputs.py:306-312)."""
        return [
            "Folder_name",
            f"Contact_residues_POI_chain_{self.poi_chain}",
            "Contact_sequence",
            f"Interacting_residues_Partner_chain_{self.partner_chain}",
            "Interacting_sequence",
        ]

    def csv_name(self) -> str:
        """Output naming contract (process_af3_outputs.py:305)."""
        return (
            f"interaction_analysis_PAE_{self.max_pae_cutoff}"
            f"_max_dist_{self.max_dist}.csv"
        )

    def interaction_dir(self) -> str:
        """process_af3_outputs.py:555"""
        return f"Interaction_cif_files_PAE_{self.max_pae_cutoff}_maxdist_{self.max_dist}"

    def overlay_dir(self) -> str:
        """process_af3_outputs.py:556"""
        return f"Overlays_PAE_{self.max_pae_cutoff}_maxdist_{self.max_dist}"
