"""Deterministic per-language lexicons, stopword lists, and scrub lexicon.

Shared by the synthetic ``web_pages`` generator (datagen.py), the
pure-pandas reference oracle (oracle/reference.py), and the Spark
pipeline (pipeline.py) so that language-ID / quality-rule / scrub
semantics are defined in exactly one place.

These play the role of the reference's language table + LM resources
(/root/reference/lgid/res/lang_table.txt, util.py:14-44) but are fully
synthetic — no external data.
"""

from __future__ import annotations

# Content words per language: distinct character distributions so a
# char-n-gram model can separate them (mirrors what Crúbadán char-trigram
# LMs give the reference, util.py:114-173).
LEXICONS: dict[str, list[str]] = {
    "eng": [
        "the", "of", "and", "to", "in", "is", "was", "that", "for", "it",
        "with", "as", "his", "on", "be", "at", "by", "had", "not", "are",
        "language", "example", "system", "query", "table", "window", "value",
        "people", "world", "water", "house", "great", "small", "between",
        "through", "should", "because", "children", "thought", "morning",
    ],
    "deu": [
        "der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich",
        "des", "auf", "für", "ist", "im", "dem", "nicht", "ein", "eine", "als",
        "sprache", "beispiel", "fenster", "wert", "tabelle", "abfrage",
        "menschen", "wasser", "haus", "groß", "klein", "zwischen", "durch",
        "sollte", "weil", "kinder", "gedanke", "morgen", "straße", "über",
    ],
    "fra": [
        "le", "de", "la", "et", "les", "des", "en", "un", "du", "une",
        "que", "est", "dans", "qui", "par", "pour", "sur", "pas", "plus", "au",
        "langue", "exemple", "fenêtre", "valeur", "tableau", "requête",
        "gens", "monde", "eau", "maison", "grand", "petit", "entre",
        "travers", "devrait", "parce", "enfants", "pensée", "matin", "être",
    ],
    "spa": [
        "el", "de", "la", "que", "y", "en", "los", "se", "del", "las",
        "un", "por", "con", "una", "su", "para", "es", "al", "lo", "como",
        "idioma", "ejemplo", "ventana", "valor", "tabla", "consulta",
        "gente", "mundo", "agua", "casa", "grande", "pequeño", "entre",
        "través", "debería", "porque", "niños", "pensamiento", "mañana", "año",
    ],
    # A synthetic low-resource language (plays the role of lgid's long tail).
    "tok": [
        "kulupu", "tenpo", "nimi", "wile", "sona", "pona", "lukin", "kama",
        "suli", "lili", "mute", "wawa", "moku", "tomo", "jan", "ilo",
        "sitelen", "kalama", "linja", "lipu", "selo", "sijelo", "kiwen",
        "telo", "seli", "kon", "ma", "suno", "mun", "pimeja", "walo", "loje",
    ],
}

# Function words used for the stopword-fraction quality rule; a subset of
# each lexicon (high-frequency grammatical words).
STOPWORDS: dict[str, list[str]] = {
    "eng": ["the", "of", "and", "to", "in", "is", "was", "that", "for", "it"],
    "deu": ["der", "die", "und", "in", "den", "von", "zu", "das", "mit", "ist"],
    "fra": ["le", "de", "la", "et", "les", "des", "en", "un", "du", "que"],
    "spa": ["el", "de", "la", "que", "y", "en", "los", "se", "del", "un"],
    "tok": ["jan", "ma", "mute", "pona", "wile", "sona", "kama", "tenpo"],
}

# Rare tokens that are valid words but never stopwords — used to build
# low-stopword documents that trip the quality rule.
RARE_TOKENS: list[str] = [
    "zygote", "quartz", "fjord", "sphinx", "crypt", "lymph", "glyph",
    "plasma", "vortex", "matrix", "nexus", "apex", "onyx", "helix",
]

# Placeholder toxicity lexicon (obviously-fake stand-in tokens; the real
# deployment swaps in a curated list — the mechanics are identical).
TOXIC_LEXICON: list[str] = ["grubnox", "zorfel", "blargfest", "snibwort"]

LANGS: list[str] = sorted(LEXICONS)

# Languages the quality filter accepts (the "allowlist"): everything the
# langid model knows. Docs classified outside it (never happens with the
# closed synthetic world) or with low confidence get dropped.
ALLOWED_LANGS: list[str] = list(LANGS)
