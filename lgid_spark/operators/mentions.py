"""Language-name mention extraction — the reference's signature operator
(/root/reference/lgid/analyzers.py:42-282 `language_mentions`),
re-expressed from scratch.

Semantics covered (cited to the reference for parity checking):
  * name normalization: NFKD diacritic strip, parenthetical strip,
    whitespace collapse, lowercase (util.py:36-52)
  * multi-word name matching via bounded adjacent token runs
    (analyzers.py:29-39 adjacent_powerset, bounded at
    analyzers.py:118-151 by in-vocabulary runs)
  * name→code fan-out: one Mention per (occurrence × ISO code)
    (analyzers.py:276-281)
  * two-line splice with `-` linebreak healing; matches lying wholly
    in the second line are skipped to avoid double counting
    (analyzers.py:82-98, 272-273)
  * char-span recovery: (startline, startcol, endline, endcol)
    (analyzers.py:188-241)
  * single-longest-mention: among matches sharing any token, keep the
    one with the most words; ties unspecified in the reference
    (analyzers.py:174-186, test/README.md:13-18) — we pin ties to
    (startcol, name) order for determinism.

Capitalization (P6, analyzers.py:68-72): capitalization='any' (default)
matches case-insensitively; capitalization='title' requires every
matched word's surface to start uppercase (the reference's default
transform). Both reference golden files reproduce exactly under 'any'
on the bundled fixture.

Spark shape: lines → lead(text) window (cross-line pairs stay narrow)
→ mapInPandas matcher (broadcast name table) → explode to a mentions
DataFrame `(doc_id, startline, startcol, endline, endcol, name, code,
text)` — the same shape as the reference's golden file
(test/mentions_gold_output.txt).
"""

from __future__ import annotations

import re
import unicodedata
from typing import Iterator, NamedTuple

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


class Mention(NamedTuple):
    startline: int
    startcol: int
    endline: int
    endcol: int
    name: str
    code: str
    text: str


# word characters include language-name punctuation (analyzers.py:77, 105)
_TOKEN_RE = re.compile(r"[^\s]+")
_PARENS_RE = re.compile(r"\([^)]*\)")
_WS_RE = re.compile(r"\s+")
_STRIP_PUNCT = re.compile(r"^[^\w'ǂ!/=-]+|[^\w'ǂ!/=-]+$", re.UNICODE)


def normalize_name(name: str) -> str:
    """util.py:36-52 semantics: NFKD → drop combining marks, drop
    parentheticals, collapse whitespace, lowercase."""
    s = unicodedata.normalize("NFKD", name)
    s = "".join(c for c in s if not unicodedata.combining(c))
    s = _PARENS_RE.sub(" ", s)
    s = _WS_RE.sub(" ", s).strip()
    return s.lower()


def _norm_token(tok: str) -> str:
    s = unicodedata.normalize("NFKD", tok)
    s = "".join(c for c in s if not unicodedata.combining(c))
    return _STRIP_PUNCT.sub("", s).lower()


_LEAD_PUNCT = re.compile(r"^[^\w'ǂ!/=-]+", re.UNICODE)
_TRAIL_PUNCT = re.compile(r"[^\w'ǂ!/=-]+$", re.UNICODE)


def _core_span(tok: str, start: int) -> tuple[int, int]:
    """Char span of the token's core (edge punctuation excluded) so
    mention columns point at the name itself, matching the reference's
    golden column convention (test/mentions_gold_output.txt)."""
    lead = _LEAD_PUNCT.match(tok)
    lo = lead.end() if lead else 0
    trail = _TRAIL_PUNCT.search(tok, lo)
    hi = trail.start() if trail else len(tok)
    return start + lo, start + hi


class NameTable:
    """Broadcastable matcher state built from {name: [codes]}.

    `word_names`: normalized first-word → list of (token_tuple, name,
    codes) so candidate runs are only explored from in-vocabulary
    anchors — the role of the reference's word→int digit-string trick
    (analyzers.py:102-118, util.py:246-304) without the encoding."""

    def __init__(self, table: dict[str, list[str]]):
        # merge codes across raw names that normalize identically —
        # "tewa (usa)"/"tewa (indonesia)"/"tewa" all become "tewa" with
        # the union of their codes (util.py:40-42 semantics)
        merged: dict[str, set[str]] = {}
        for name, codes in table.items():
            norm = normalize_name(name)
            if norm:
                merged.setdefault(norm, set()).update(codes)
        self.by_first: dict[str, list[tuple[tuple[str, ...], str, tuple[str, ...]]]] = {}
        self.max_words = 1
        for norm in sorted(merged):
            toks = tuple(norm.split(" "))
            if not toks or not toks[0]:
                continue
            self.max_words = max(self.max_words, len(toks))
            self.by_first.setdefault(toks[0], []).append(
                (toks, norm, tuple(sorted(merged[norm]))))


def _is_title(raw: str) -> bool:
    for c in raw:
        if c.isalpha():
            return c.isupper()
    return False


def _line_tokens(line: str) -> list[tuple[str, int, int, bool]]:
    """(normalized_token, core_startcol, core_endcol, is_title) per raw
    token; is_title = first alphabetic char is uppercase (P6)."""
    out = []
    for m in _TOKEN_RE.finditer(line):
        nt = _norm_token(m.group())
        if nt:
            lo, hi = _core_span(m.group(), m.start())
            out.append((nt, lo, hi, _is_title(m.group())))
    return out


def find_mentions(
    lines: list[tuple[int, str]],
    table: NameTable,
    single_longest: bool = False,
    capitalization: str = "any",
) -> list[Mention]:
    """Pure-function mention extraction over (lineno, text) lines.
    Shared verbatim by the oracle and the Spark UDF."""
    mentions: list[Mention] = []
    n = len(lines)
    for idx in range(n):
        lineno, text = lines[idx]
        # token = (norm, startcol, endcol, startline, endline, is_title)
        toks = [(t, s, e, lineno, lineno, ti)
                for t, s, e, ti in _line_tokens(text)]
        # two-line splice (analyzers.py:82-98): append next line's tokens,
        # healing a trailing dash by merging the boundary tokens
        boundary = len(toks)
        alt_forms: dict[int, str] = {}
        if idx + 1 < n and lines[idx + 1][0] == lineno + 1:
            nl = lines[idx + 1][0]
            ntoks = [(t, s, e, nl, nl, ti)
                     for t, s, e, ti in _line_tokens(lines[idx + 1][1])]
            if text.rstrip().endswith("-") and toks and ntoks:
                lt, ls, _le, lsl, _lel, lti = toks[-1]
                nt, _ns, ne, _nsl, nel, _nti = ntoks[0]
                # the line-break hyphen may be spurious ("Méren-/glo" →
                # merenglo) or part of the name ("Wangaaybuwan-/Ngiyambaa"
                # → wangaaybuwan-ngiyambaa): keep the hyphen as the
                # primary form and try the dash-stripped one as an alt
                merged = (lt + nt, ls, ne, lsl, nel, lti)
                alt_forms[len(toks) - 1] = lt.rstrip("-") + nt
                toks = toks[:-1] + [merged]
                boundary = len(toks)  # merged token is line-1-anchored
                ntoks = ntoks[1:]
            toks = toks + ntoks

        found: list[tuple[int, int, str, tuple[str, ...]]] = []
        for i in range(len(toks)):
            if i >= boundary:
                break  # matches wholly in line 2 counted there (272-273)
            forms = [toks[i][0]]
            if i in alt_forms:
                forms.append(alt_forms[i])
            seen_here: set[str] = set()
            for form in forms:
                cands = table.by_first.get(form)
                if not cands:
                    continue
                for cand_toks, norm, codes in cands:
                    j = i + len(cand_toks)
                    if j > len(toks) or norm in seen_here:
                        continue
                    run = (form,) + tuple(t[0] for t in toks[i + 1:j])
                    if run != cand_toks:
                        continue
                    if capitalization == "title" and not all(
                            toks[k][5] for k in range(i, j)):
                        continue  # P6: every word must be title-cased
                    found.append((i, j, norm, codes))
                    seen_here.add(norm)

        if single_longest:
            # analyzers.py:174-186: keep only the longest match (by word
            # count) per ADJACENT word group — matches whose token ranges
            # touch or overlap chain into one group ("Norwegian Finnish"
            # is one group; only one survives). Ties are unspecified
            # upstream (test/README.md:13-18); we pin (start, name).
            found.sort()
            groups: list[list[tuple[int, int, str, tuple[str, ...]]]] = []
            for f in found:
                if groups and f[0] <= max(g[1] for g in groups[-1]):
                    groups[-1].append(f)
                else:
                    groups.append([f])
            chosen = []
            for g in groups:
                g.sort(key=lambda f: (-(f[1] - f[0]), f[0], f[2]))
                chosen.append(g[0])
            found = sorted(chosen)

        for (i, j, norm, codes) in sorted(found):
            s_tok, e_tok = toks[i], toks[j - 1]
            startcol = s_tok[1]
            endcol = e_tok[2]
            sl = s_tok[3]
            el = e_tok[4]
            surface = " ".join(t[0] for t in toks[i:j])
            for code in codes:
                mentions.append(
                    Mention(sl, startcol, el, endcol, norm, code, surface))
    return mentions


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------

MENTION_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("startline", T.IntegerType()),
    T.StructField("startcol", T.IntegerType()),
    T.StructField("endline", T.IntegerType()),
    T.StructField("endcol", T.IntegerType()),
    T.StructField("name", T.StringType()),
    T.StructField("code", T.StringType()),
    T.StructField("text", T.StringType()),
])


def extract_mentions(
    spark: SparkSession,
    lines_df: DataFrame,
    lang_table: dict[str, list[str]],
    single_longest: bool = False,
    capitalization: str = "any",
) -> DataFrame:
    """lines(doc_id, lineno, text) → mentions DataFrame.

    The two-line splice is satisfied by a lead() window (one narrow
    shuffle on doc_id, which a bucketed lines table avoids entirely);
    after that every row is independent, so the matcher runs as a
    mapInPandas over (lineno, text, next_text) with the name table
    broadcast once per executor."""
    table = NameTable(lang_table)
    bc = spark.sparkContext.broadcast(table)

    w = Window.partitionBy("doc_id").orderBy("lineno")
    paired = lines_df.select(
        "doc_id", "lineno", "text",
        F.lead("lineno").over(w).alias("next_lineno"),
        F.lead("text").over(w).alias("next_text"),
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        t = bc.value
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                lines = [(int(r.lineno), r.text or "")]
                if r.next_lineno is not None and not pd.isna(r.next_lineno):
                    lines.append((int(r.next_lineno), r.next_text or ""))
                for m in find_mentions(lines, t, single_longest, capitalization):
                    if m.startline != int(r.lineno):
                        continue  # emitted by the row anchored there
                    rows.append((r.doc_id, *m))
            yield pd.DataFrame(rows, columns=MENTION_SCHEMA.fieldNames())

    return paired.mapInPandas(run, schema=MENTION_SCHEMA)


def mentions_oracle(
    doc_lines: dict[str, list[tuple[int, str]]],
    lang_table: dict[str, list[str]],
    single_longest: bool = False,
) -> list[tuple]:
    """Pure-Python whole-document oracle (golden-file generator)."""
    table = NameTable(lang_table)
    out = []
    for doc_id, lines in doc_lines.items():
        for m in find_mentions(lines, table, single_longest):
            out.append((doc_id, *m))
    return sorted(out)
