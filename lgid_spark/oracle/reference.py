"""Pure-pandas/Python reference oracle for the quality-filter pipeline.

This module is the *reference implementation* the Spark pipeline must
match byte-for-byte (BASELINE.json north_rule: keep/drop F1≥0.99,
extracted/scrubbed text byte-identical per url). It plays the role the
golden files play for lgid's mention extractor
(/root/reference/test/README.md:9-18): fixtures are generated from here
and pytest compares Spark output against it.

Everything is a pure function — no RNG, no I/O — and the langid /
perplexity models are deterministic functions of the lexicons, so the
oracle is reproducible on any machine.

Semantics re-expressed from the reference (not ported):
  * langid        ≈ lgid's candidate-language scoring (features.py) as a
                    fastText-style hashed char-n-gram linear model
  * perplexity    ≈ lgid's LM-match ratio (features.py:337-354) as a
                    KenLM-style char-trigram log-probability
  * quality rules = Gopher/C4 heuristics (north_star)
  * scrub         = ordered Python-`re` chain (pinned; the Spark side
                    runs the SAME compiled regexes inside pandas UDFs)
"""

from __future__ import annotations

import html as _html_mod
import math
import re
import zlib
from functools import lru_cache

import numpy as np

from ..lexicons import ALLOWED_LANGS, LANGS, LEXICONS, STOPWORDS, TOXIC_LEXICON

# ---------------------------------------------------------------------------
# 1. HTML → text extraction (byte-identical contract per url)
# ---------------------------------------------------------------------------

_DROP_BLOCKS = re.compile(
    r"(?is)<(script|style|nav|header|footer)\b.*?</\1\s*>")
_TAG = re.compile(r"(?s)<[^>]+>")
_WS = re.compile(r"[ \t\r\f\v]+")


def extract_text(html: bytes) -> str:
    """Strip boilerplate blocks, drop tags, unescape entities, normalize
    whitespace per line. Pure function of the bytes."""
    s = html.decode("utf-8", errors="replace")
    s = _DROP_BLOCKS.sub(" ", s)
    s = _TAG.sub("\n", s)
    s = _html_mod.unescape(s)
    # ONE whitespace-collapse pass over the whole text instead of one
    # sub per line: _WS's class excludes \n, so the global sub touches
    # exactly what the per-line subs did (was ~30 re.sub calls/doc —
    # the hot spot of extraction profiling). Per-line strip() still
    # runs per line (it also trims unicode spaces like the \xa0 that
    # unescape introduces, which _WS deliberately leaves inside lines).
    s = _WS.sub(" ", s)
    return "\n".join(
        line for line in (raw.strip() for raw in s.split("\n")) if line)


# ---------------------------------------------------------------------------
# 2. Hashed char-n-gram langid (fastText-style) + perplexity (KenLM-style)
# ---------------------------------------------------------------------------

N_BUCKETS = 1 << 18
_ALPHA = 0.1
_GRAM_N = 3


def _grams(word: str) -> list[str]:
    w = f" {word} "
    return [w[k:k + _GRAM_N] for k in range(len(w) - _GRAM_N + 1)]


def _bucket(gram: str) -> int:
    return zlib.crc32(gram.encode("utf-8")) % N_BUCKETS


_TOKEN_RE = re.compile(r"\s+")
_PUNCT_EDGE = re.compile(r"^\W+|\W+$", re.UNICODE)


def tokenize(text: str) -> list[str]:
    # str.split() ≡ unicode-\s+ split with empties dropped, but C-speed
    return text.split()


def norm_word(w: str) -> str:
    # alnum edge chars ⊆ \w, so _PUNCT_EDGE (^\W+|\W+$) is the identity
    # on such words — skip the regex (true for most words; the sub was
    # the single largest remaining re cost in process_batch profiling)
    if w and w[0].isalnum() and w[-1].isalnum():
        return w.lower()
    return _PUNCT_EDGE.sub("", w).lower()


class LangIDModel:
    """log P(gram | lang) over hashed char-trigram buckets.

    Weights are a dense (N_BUCKETS, n_langs) float32 matrix — ~5 MB —
    broadcast to executors by the Spark side. Doubles as the perplexity
    table: ppl(text, lang) = exp(-mean log P(gram|lang))."""

    def __init__(self) -> None:
        self.langs = list(LANGS)
        counts = np.zeros((N_BUCKETS, len(self.langs)), dtype=np.float64)
        for li, lang in enumerate(self.langs):
            for word in LEXICONS[lang]:
                for g in _grams(word.lower()):
                    counts[_bucket(g), li] += 1.0
        totals = counts.sum(axis=0)
        self.logp = np.log(
            (counts + _ALPHA) / (totals + _ALPHA * N_BUCKETS)
        ).astype(np.float32)

    @classmethod
    def from_weights(cls, logp: np.ndarray, langs: list[str]) -> "LangIDModel":
        """Executor-side constructor from broadcast weights — skips the
        training pass entirely (cold-start cost matters ×1000 workers)."""
        m = cls.__new__(cls)
        m.logp = logp
        m.langs = langs
        return m

    # -- scoring -----------------------------------------------------------
    def _text_buckets(self, text: str) -> np.ndarray:
        buckets: list[int] = []
        for w in tokenize(text):
            nw = norm_word(w)
            if nw:
                buckets.extend(_bucket(g) for g in _grams(nw))
        return np.asarray(buckets, dtype=np.int64)

    def _score_buckets(self, b: np.ndarray) -> tuple[str, float, float]:
        if b.size == 0:
            return self.langs[0], 1.0 / len(self.langs), float("inf")
        # sum/size instead of .mean(): bitwise-equal (np.mean is the
        # same pairwise float32 reduce divided by n) without ~25 µs of
        # _mean wrapper overhead per call — measured ~10% of score time
        g = self.logp[b]
        mean_logp = g.sum(axis=0) / np.float32(g.shape[0])
        # softmax over per-gram mean log-probs, scaled by gram count
        z = mean_logp - mean_logp.max()
        p = np.exp(z * min(b.size, 50))  # sharpen with evidence volume
        p = p / p.sum()
        li = int(np.argmax(p))
        ppl = float(np.exp(-mean_logp[li]))
        return self.langs[li], float(p[li]), ppl

    def score(self, text: str) -> tuple[str, float, float]:
        """→ (lang_pred, confidence, ppl). Deterministic ties: first lang
        in sorted order wins (np.argmax takes first, same rule as the
        reference's find_best_and_normalize, main.py:321-323)."""
        return self._score_buckets(self._text_buckets(text))

    def score_batch(self, texts) -> list[tuple[str, float, float]]:
        """Batch scoring with per-word bucket memoization — numerically
        identical to score() (per-word arrays concatenate to exactly the
        same bucket sequence) but skips re-hashing repeated words, which
        dominates on Zipfian web text. Used by the Spark pandas UDF."""
        cache: dict[str, np.ndarray] = {}
        empty = np.asarray([], dtype=np.int64)
        out = []
        for text in texts:
            arrs = []
            for w in tokenize(text or ""):
                nw = norm_word(w)
                if not nw:
                    continue
                a = cache.get(nw)
                if a is None:
                    a = np.asarray(
                        [_bucket(g) for g in _grams(nw)], dtype=np.int64)
                    cache[nw] = a
                arrs.append(a)
            b = np.concatenate(arrs) if arrs else empty
            out.append(self._score_buckets(b))
        return out


@lru_cache(maxsize=1)
def get_langid_model() -> LangIDModel:
    return LangIDModel()


# ---------------------------------------------------------------------------
# 3. Quality metrics + rules (Gopher/C4-style)
# ---------------------------------------------------------------------------

MIN_CHARS = 100
MAX_SYMBOL_WORD_RATIO = 0.10
MIN_STOPWORD_RATIO = 0.05
MAX_REPETITION_RATIO = 0.30
PPL_THRESHOLD = 50_000.0
CONF_THRESHOLD = 0.50

_SYMBOLS = set("@#$%^&*+=<>~|{}[]\\")
# NB: measured — per-symbol str.count (memchr) beats one str.translate
# pass (per-char dict lookup) ~1.2× on these text sizes; keep count()
_SYMBOL_LIST = sorted(_SYMBOLS)
# per-language stopword sets hoisted out of the per-document loop
_STOPSETS = {lang: frozenset(ws) for lang, ws in STOPWORDS.items()}
_EMPTY_STOPSET: frozenset = frozenset()


def metrics_for(text: str, lang_pred: str) -> dict:
    words = tokenize(text)
    n_words = len(words)
    n_chars = len(text)
    lines = text.split("\n") if text else []
    mean_line_len = (sum(len(ln) for ln in lines) / len(lines)) if lines else 0.0
    n_sym = sum(text.count(c) for c in _SYMBOLS)
    symbol_word_ratio = n_sym / n_words if n_words else 0.0
    stops = _STOPSETS.get(lang_pred, _EMPTY_STOPSET)
    n_stop = sum(1 for w in words if norm_word(w) in stops)
    stopword_ratio = n_stop / n_words if n_words else 0.0
    if n_words >= 3:
        trigrams = set(zip(words, words[1:], words[2:]))
        repetition_ratio = 1.0 - len(trigrams) / (n_words - 2)
    else:
        repetition_ratio = 0.0
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_line_len": mean_line_len,
        "symbol_word_ratio": symbol_word_ratio,
        "stopword_ratio": stopword_ratio,
        "repetition_ratio": repetition_ratio,
    }


def drop_reasons_for(m: dict, lang_pred: str, conf: float, ppl: float) -> list[str]:
    reasons = []
    if m["n_chars"] < MIN_CHARS:
        reasons.append("too_short")
    if m["symbol_word_ratio"] > MAX_SYMBOL_WORD_RATIO:
        reasons.append("too_symbolic")
    if m["stopword_ratio"] < MIN_STOPWORD_RATIO:
        reasons.append("low_stopword")
    if m["repetition_ratio"] > MAX_REPETITION_RATIO:
        reasons.append("repetitive")
    if ppl > PPL_THRESHOLD:
        reasons.append("high_perplexity")
    if lang_pred not in ALLOWED_LANGS or conf < CONF_THRESHOLD:
        reasons.append("bad_lang")
    return sorted(reasons)


# ---------------------------------------------------------------------------
# 4. PII / toxicity scrub (ordered, Python-`re`-pinned)
# ---------------------------------------------------------------------------

EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
PHONE_RE = re.compile(r"(?:\+?1[\s.-]?)?\(?\d{3}\)?[\s.-]\d{3}[\s.-]?\d{4}")
SSN_RE = re.compile(r"\b\d{3}-\d{2}-\d{4}\b")
TOXIC_RE = re.compile(
    r"\b(?:" + "|".join(re.escape(w) for w in TOXIC_LEXICON) + r")\b",
    re.IGNORECASE,
)

# Order matters (SSN before a bare-digit phone variant could differ);
# pinned here, mirrored exactly by the Spark side which imports these
# compiled patterns.
SCRUB_CHAIN: list[tuple[re.Pattern, str]] = [
    (EMAIL_RE, "<EMAIL>"),
    (SSN_RE, "<SSN>"),
    (PHONE_RE, "<PHONE>"),
    (TOXIC_RE, "<TOX>"),
]


_DIGITS = "0123456789"
_TOXIC_WORDS_LOWER = tuple(w.lower() for w in TOXIC_LEXICON)


def scrub_text(text: str) -> str:
    # Pre-checks short-circuit regex scans that provably cannot match —
    # output identical to the unguarded chain (measured: scrub was ~47%
    # of process_batch, and 6/7 synthetic docs are digit-free):
    #   '@'      — EMAIL_RE requires a literal '@';
    #   digits   — SSN_RE/PHONE_RE both require \d;
    #   lexicon  — for ASCII text, any TOXIC_RE (IGNORECASE, \b-bounded
    #              ASCII words) match implies lowercase containment of
    #              some lexicon word (containment is a superset: no
    #              word boundaries). Non-ASCII text skips the guard —
    #              sre's 1-1 case table can match chars (e.g. U+0130)
    #              whose str.lower() is multi-char, so containment is
    #              not a safe proxy there.
    if "@" in text:
        text = EMAIL_RE.sub("<EMAIL>", text)
    is_ascii = text.isascii()
    if not is_ascii or any(d in text for d in _DIGITS):
        text = SSN_RE.sub("<SSN>", text)
        text = PHONE_RE.sub("<PHONE>", text)
    if is_ascii:
        # hoist the lowercase copy OUT of the any() — a generator
        # re-evaluates text.lower() per lexicon word, allocating
        # len(lexicon) full copies of the document on the common
        # no-match path
        lowered = text.lower()
        if any(w in lowered for w in _TOXIC_WORDS_LOWER):
            text = TOXIC_RE.sub("<TOX>", text)
    else:
        text = TOXIC_RE.sub("<TOX>", text)
    return text


# ---------------------------------------------------------------------------
# 4b. Single-pass batch processing (tokenize once, share across langid /
#     metrics / scrub) — numerically identical to the per-stage functions
#     (verified by tests/test_pipeline_parity.py + test_oracle_internal).
#     This is what the Spark fused pandas UDF calls: Python-side work
#     scales linearly across worker processes, unlike 32-thread JVM
#     string-array allocation which GC-thrashes a shared heap.
# ---------------------------------------------------------------------------


def process_batch(texts, model: "LangIDModel",
                  emit_extracted: bool = True,
                  emit_scrubbed: bool = True) -> list[dict]:
    """Fused per-text scoring. The emit flags drop the two TEXT fields
    from the output dicts — the Arrow-volume levers for the fused UDF
    (a metrics/keep-only consumer pays for ints+doubles instead of
    shipping the full document text back JVM-side); emit_scrubbed=False
    additionally skips the scrub regex work itself."""
    return _process_batch_impl(texts, model, emit_extracted, emit_scrubbed)


def _process_batch_impl(texts, model, emit_extracted, emit_scrubbed):
    # one cache keyed by the RAW word: (normalized form, bucket array)
    # — a single dict hit per token covers normalization AND hashing
    word_cache: dict[str, tuple[str, "np.ndarray | None"]] = {}
    wc_get = word_cache.get
    empty = np.asarray([], dtype=np.int64)
    out = []
    for text in texts:
        text = text or ""
        words = tokenize(text)
        normed = []
        arrs = []
        napp = normed.append
        aapp = arrs.append
        for w in words:
            hit = wc_get(w)
            if hit is None:
                nw = norm_word(w)
                a = (
                    np.asarray([_bucket(g) for g in _grams(nw)], dtype=np.int64)
                    if nw else None
                )
                hit = (nw, a)
                word_cache[w] = hit
            nw, a = hit
            napp(nw)
            if a is not None:
                aapp(a)
        b = np.concatenate(arrs) if arrs else empty
        lang_pred, conf, ppl = model._score_buckets(b)

        n_words = len(words)
        n_chars = len(text)
        lines = text.split("\n") if text else []
        mean_line_len = (
            sum(len(ln) for ln in lines) / len(lines)) if lines else 0.0
        n_sym = sum(text.count(c) for c in _SYMBOL_LIST)
        symbol_word_ratio = n_sym / n_words if n_words else 0.0
        stops = _STOPSETS.get(lang_pred, _EMPTY_STOPSET)
        n_stop = sum(map(stops.__contains__, normed))  # C-speed membership
        stopword_ratio = n_stop / n_words if n_words else 0.0
        if n_words >= 3:
            trigrams = set(zip(words, words[1:], words[2:]))
            repetition_ratio = 1.0 - len(trigrams) / (n_words - 2)
        else:
            repetition_ratio = 0.0
        row = {}
        if emit_extracted:
            row["extracted_text"] = text
        row.update({
            "lang_pred": lang_pred,
            "langid_conf": conf,
            "ppl": ppl,
            "n_chars": n_chars,
            "n_words": n_words,
            "mean_line_len": mean_line_len,
            "symbol_word_ratio": symbol_word_ratio,
            "stopword_ratio": stopword_ratio,
            "repetition_ratio": repetition_ratio,
        })
        if emit_scrubbed:
            row["scrubbed_text"] = scrub_text(text)
        out.append(row)
    return out


# ---------------------------------------------------------------------------
# 5. Full reference pipeline over a pandas frame of web_pages
# ---------------------------------------------------------------------------

def process_pages(pdf) -> "object":
    """pandas web_pages → golden_labels frame (FIXTURES.md §6)."""
    import pandas as pd

    model = get_langid_model()
    out = []
    for r in pdf.itertuples(index=False):
        etext = extract_text(r.html)
        lang_pred, conf, ppl = model.score(etext)
        m = metrics_for(etext, lang_pred)
        reasons = drop_reasons_for(m, lang_pred, conf, ppl)
        out.append({
            "url": r.url,
            "extracted_text": etext,
            "lang_pred": lang_pred,
            "langid_conf": conf,
            "ppl": ppl,
            "stopword_ratio": m["stopword_ratio"],
            "mean_line_len": m["mean_line_len"],
            "symbol_word_ratio": m["symbol_word_ratio"],
            "repetition_ratio": m["repetition_ratio"],
            "drop_reasons": reasons,
            "keep": len(reasons) == 0,
            "scrubbed_text": scrub_text(etext),
        })
    return pd.DataFrame(out)
