"""Synthetic fixtures for the mention extractor (FIXTURES.md §3-§4).

A small language-name dimension with the same hard cases the reference's
golden test exercises (test/mentions_test.freki, mentions_gold_output.txt):
multi-word names, one name with 7 codes (fulfulde-style fan-out), names
sharing words, very short names, diacritics, parentheticals.
"""

from __future__ import annotations

LANG_TABLE: dict[str, list[str]] = {
    # 7-code fan-out (gold fixture has 7 rows for 'fulfulde')
    "tokri": ["tk1", "tk2", "tk3", "tk4", "tk5", "tk6", "tk7"],
    # multi-word names, sharing words with each other and with 'tokri'
    "north tokri": ["ntk"],
    "upper north tokri": ["untk"],
    "west molvani": ["wmv"],
    "molvani": ["mv1", "mv2"],
    # diacritics: normalized form drops the accents (util.py:46-52)
    "mérenglo": ["mrg"],
    # parenthetical dropped by normalization (util.py:37)
    "sorbex (eastern)": ["sbx"],
    # short names (≤3 chars)
    "ik": ["ikx"],
    "aer": ["aer"],
    # plain single-word names
    "quenya": ["qya"],
    "valdese": ["vld"],
}

# (doc_id, lineno, text) — crafted lines, one quirk each
LINES: list[tuple[str, int, str]] = [
    ("d1", 1, "The speakers of Tokri live north of the river."),
    ("d1", 2, "Upper North Tokri is a dialect of North Tokri."),
    ("d1", 3, "nothing to see here"),
    ("d1", 4, "Comparative notes on West Molvani and Molvani follow."),
    # cross-line: 'mérenglo' split by dash healing (analyzers.py:82-98)
    ("d1", 5, "We also consider the Méren-"),
    ("d1", 6, "glo language family."),
    # diacritic-free surface must match diacritic name
    ("d1", 7, "The merenglo verb system is rich."),
    # short names amid punctuation
    ("d1", 8, "Examples from Ik, Aer: and Quenya (above)."),
    ("d2", 1, "Valdese valdese VALDESE"),
    # overlapping multi-word matches for single-longest-mention
    ("d2", 2, "Upper North Tokri examples."),
    ("d2", 3, "No mentions on this line."),
]


def doc_lines() -> dict[str, list[tuple[int, str]]]:
    out: dict[str, list[tuple[int, str]]] = {}
    for doc_id, lineno, text in LINES:
        out.setdefault(doc_id, []).append((lineno, text))
    return out


def lines_rows() -> list[tuple[str, int, str]]:
    return list(LINES)
