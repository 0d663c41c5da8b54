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
def normalize_name(name: str) -> str:
    """util.py:36-52 semantics: NFKD → drop combining marks, drop
    parentheticals, collapse whitespace, lowercase."""
    s = unicodedata.normalize("NFKD", name)
    s = "".join(c for c in s if not unicodedata.combining(c))
    s = _PARENS_RE.sub(" ", s)
    s = _WS_RE.sub(" ", s).strip()
    return s.lower()


_CORE_RE = re.compile(r"(['ǂ!/=]*\w+([-'/]+\w+)*)", re.UNICODE)


def _norm_token(tok: str) -> str:
    """Reference punc_strip_re capture (analyzers.py:77): optional
    leading click/glottal markers, then word chars joined by interior
    -'/ runs. Unlike a symmetric edge-strip, a dash at the EDGE is
    punctuation ('Even-' → 'even', '-Ngiyambaa' → 'ngiyambaa') while an
    interior dash is part of the name ('kabi-ye' stays)."""
    s = unicodedata.normalize("NFKD", tok)
    s = "".join(c for c in s if not unicodedata.combining(c))
    m = _CORE_RE.search(s)
    return m.group(1).lower() if m else ""


def _core_span(tok: str, start: int) -> tuple[int, int]:
    """Char span of the token's core (same capture as _norm_token, on
    the raw token) so mention columns point at the name itself,
    matching the reference's golden column convention
    (test/mentions_gold_output.txt)."""
    m = _CORE_RE.search(tok)
    if not m:
        return start, start + len(tok)
    return start + m.start(1), start + m.end(1)


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
        # word-level vocabulary (the reference's word_to_int keys):
        # membership drives the dash fallback and the single-mention
        # section grouping
        self.vocab: set[str] = set()
        for norm in sorted(merged):
            toks = tuple(norm.split(" "))
            if not toks or not toks[0]:
                continue
            self.max_words = max(self.max_words, len(toks))
            self.vocab.update(toks)
            self.by_first.setdefault(toks[0], []).append(
                (toks, norm, tuple(sorted(merged[norm]))))

    def canon(self, form: str) -> str:
        """Reference analyzers.py:102-117 word mapping: the word itself
        if in vocabulary, else — for dashed words — the dash-removed
        form if THAT is in vocabulary ('kabi-ye' matches name 'kabiye').
        Unknown words pass through (they can never match anyway)."""
        if form in self.vocab or "-" not in form:
            return form
        alt = form.replace("-", "")
        return alt if alt in self.vocab else form


def _is_title(raw: str) -> bool:
    for c in raw:
        if c.isalpha():
            return c.isupper()
    return False


# process-level memo of the pure per-token derivation (norm, relative
# core span, is_title) — web token vocabularies are Zipfian, and the
# NFKD + combining-mark scan + two regex searches per token were the
# matcher's dominant per-row cost (r6; same bounded-pure-cache pattern
# as oracle.reference._WORD_CACHE)
_TOKEN_CACHE: dict[str, tuple[str, int, int, bool]] = {}
_TOKEN_CACHE_MAX = 1 << 20


def _tok_props(raw: str) -> tuple[str, int, int, bool]:
    hit = _TOKEN_CACHE.get(raw)
    if hit is None:
        if len(_TOKEN_CACHE) > _TOKEN_CACHE_MAX:
            _TOKEN_CACHE.clear()
        nt = _norm_token(raw)
        lo, hi = _core_span(raw, 0)
        hit = (nt, lo, hi, _is_title(raw))
        _TOKEN_CACHE[raw] = hit
    return hit


def _line_tokens(line: str) -> list[tuple[str, int, int, bool]]:
    """(normalized_token, core_startcol, core_endcol, is_title) per raw
    token; is_title = first alphabetic char is uppercase (P6)."""
    out = []
    for m in _TOKEN_RE.finditer(line):
        nt, lo, hi, ti = _tok_props(m.group())
        if nt:
            s = m.start()
            out.append((nt, s + lo, s + hi, ti))
    return out


def find_mentions(
    lines: list[tuple],
    table: NameTable,
    single_longest: bool = False,
    capitalization: str = "any",
) -> list[Mention]:
    """Pure-function mention extraction over (lineno, text[, block_id])
    lines. Shared verbatim by the oracle and the Spark UDF. When block
    ids are present, the two-line splice only pairs lines of the SAME
    block — the reference iterates `for line1 in block.lines`
    (analyzers.py:80) and never pairs across blocks."""
    mentions: list[Mention] = []
    n = len(lines)
    for idx in range(n):
        lineno, text = lines[idx][0], lines[idx][1]
        # token = (norm, startcol, endcol, startline, endline, is_title)
        toks = [(table.canon(t), s, e, lineno, lineno, ti)
                for t, s, e, ti in _line_tokens(text)]
        # two-line splice (analyzers.py:82-98): append next line's tokens,
        # healing a break dash by merging the boundary tokens
        boundary = len(toks)
        same_block = (
            idx + 1 < n
            and lines[idx + 1][0] == lineno + 1
            and (len(lines[idx]) < 3 or len(lines[idx + 1]) < 3
                 or lines[idx][2] == lines[idx + 1][2])
        )
        if same_block:
            nl = lines[idx + 1][0]
            ntext = lines[idx + 1][1]
            ntoks = [(table.canon(t), s, e, nl, nl, ti)
                     for t, s, e, ti in _line_tokens(ntext)]
            # dash healing fires in EITHER direction, on the RAW line
            # text (ADVICE r4 parity: analyzers.py:88 tests the
            # unstripped line1.endswith('-') / line2.startswith('-'),
            # so a 'dash+space' line ending does NOT fuse — its
            # trailing dash is instead dropped like the reference's
            # rstrip(' -') space-join path, which token normalization
            # already does). The healed word is the raw concatenation
            # last-chunk(line1)+first-chunk(line2) exactly as
            # analyzers.py:89 joins rstrip(' ')/lstrip(' ') strings:
            # "Méren-"+"glo" → méren-glo, "Wangaaybuwan"+"-Ngiyambaa"
            # → wangaaybuwan-ngiyambaa (canon() supplies the
            # dash-removed fallback), while a bare '-' boundary chunk
            # ("foo -"+"bar") yields '-bar' whose core lies wholly in
            # line 2 — counted in the NEXT iteration per the
            # reference's line_break rule (analyzers.py:251,272-273),
            # NOT healed into 'foo-bar'.
            if text.endswith("-") or ntext.startswith("-"):
                m1 = None
                for m1 in _TOKEN_RE.finditer(text):
                    pass  # last raw whitespace-chunk of line 1
                m2 = _TOKEN_RE.search(ntext)
                if m1 is not None and m2 is not None:
                    raw = m1.group() + m2.group()
                    k = len(m1.group())
                    # the chunks the merge consumes are present in
                    # toks/ntoks only if their own norm was nonempty
                    if _norm_token(m1.group()):
                        toks = toks[:-1]
                    if _norm_token(m2.group()):
                        ntoks = ntoks[1:]
                    nt_merged = table.canon(_norm_token(raw))
                    if nt_merged:
                        cs, ce = _core_span(raw, 0)
                        sl2, sc = ((lineno, m1.start() + cs) if cs < k
                                   else (nl, m2.start() + cs - k))
                        el2, ec = ((lineno, m1.start() + ce) if ce <= k
                                   else (nl, m2.start() + ce - k))
                        merged = (nt_merged, sc, ec, sl2, el2,
                                  _is_title(raw))
                        if sl2 == lineno:
                            # core starts in line 1: matches starting
                            # at the healed token belong to this
                            # iteration
                            toks = toks + [merged]
                        else:
                            # core wholly in line 2: continuation
                            # token only; its own matches are the next
                            # iteration's
                            ntoks = [merged] + ntoks
                boundary = len(toks)
            toks = toks + ntoks

        found: list[tuple[int, int, str, tuple[str, ...]]] = []
        for i in range(len(toks)):
            if i >= boundary:
                break  # matches wholly in line 2 counted there (272-273)
            form = toks[i][0]
            cands = table.by_first.get(form)
            if not cands:
                continue
            seen_here: set[str] = set()
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
            # analyzers.py:136-186: one candidate SECTION per maximal
            # run of consecutive in-vocabulary words (the language_
            # strings split on 'N'); only the longest match per section
            # survives — even when two matches in the section don't
            # touch ("Even good day" with 'good' in the vocabulary is
            # ONE section; only 'even' survives). Ties are unspecified
            # upstream (test/README.md:13-18); we pin (start, name).
            run_id = []
            rid = -1
            prev_in = False
            for tk in toks:
                in_vocab = tk[0] in table.vocab
                if in_vocab and not prev_in:
                    rid += 1
                run_id.append(rid if in_vocab else None)
                prev_in = in_vocab
            found.sort()
            groups: dict[int, list] = {}
            for f in found:
                groups.setdefault(run_id[f[0]], []).append(f)
            chosen = []
            for g in groups.values():
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
    single_line: bool = False,
) -> DataFrame:
    """lines(doc_id, lineno, text) → mentions DataFrame.

    The two-line splice is satisfied by a lead() window (one narrow
    shuffle on doc_id, which a bucketed lines table avoids entirely);
    after that every row is independent, so the matcher runs as a
    mapInPandas over (lineno, text, next_text) with the name table
    broadcast once per executor.

    ``single_line=True`` (r6): callers that construct one-line-per-doc
    frames (e.g. the document-grain mention queries) declare it so the
    lead() window — a full shuffle+sort whose lead() is null on every
    single-row partition — is skipped; the matcher sees the identical
    (next=null) input it would have computed."""
    table = NameTable(lang_table)
    bc = spark.sparkContext.broadcast(table)

    has_block = "block_id" in lines_df.columns
    if single_line:
        cols = [
            "doc_id", "lineno", "text",
            F.lit(None).cast("int").alias("next_lineno"),
            F.lit(None).cast("string").alias("next_text"),
        ]
        if has_block:
            cols += ["block_id",
                     F.lit(None).cast("string").alias("next_block_id")]
    else:
        w = Window.partitionBy("doc_id").orderBy("lineno")
        cols = [
            "doc_id", "lineno", "text",
            F.lead("lineno").over(w).alias("next_lineno"),
            F.lead("text").over(w).alias("next_text"),
        ]
        if has_block:
            # the splice must not pair lines across Freki blocks — the
            # reference walks `block.lines` (analyzers.py:80)
            cols += ["block_id",
                     F.lead("block_id").over(w).alias("next_block_id")]
    paired = lines_df.select(*cols)
    if single_line:
        # the matcher is the expensive stage; a small single-file scan
        # yields ~2 splits — repartition up to executor parallelism
        # (no-op at scale; the not-single_line path shuffles anyway)
        from ..parallelism import spread

        paired = spread(paired)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        t = bc.value
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                blk = getattr(r, "block_id", None)
                lines = [(int(r.lineno), r.text or "", blk)]
                if r.next_lineno is not None and not pd.isna(r.next_lineno):
                    lines.append((int(r.next_lineno), r.next_text or "",
                                  getattr(r, "next_block_id", None)))
                if not has_block:
                    lines = [ln[:2] for ln in lines]
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
