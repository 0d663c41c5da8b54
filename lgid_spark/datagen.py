"""Deterministic synthetic ``web_pages`` generator (FIXTURES.md §1).

Schema exactly per BASELINE.json ``input_hint``:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Every value is a pure function of (seed, row index) via md5 — no global
RNG state — so any scale factor regenerates byte-identically on any
machine / Python version. One heavily-skewed host (~20% of rows) is
built in to exercise salted repartition.

The generator is intentionally driver-free: ``row(i)`` builds one row,
so Spark can build the table distributed via ``spark.range(n)`` +
``mapInPandas`` (see :func:`spark_web_pages`) — at 10^12 rows nothing
ever materializes on one node.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import html as _html_mod
from typing import Iterator

from .lexicons import LANGS, LEXICONS, RARE_TOKENS, STOPWORDS, TOXIC_LEXICON

SEED = "lgid-spark-v1"
N_HOSTS = 50
SKEW_HOST = 0  # host0 receives ~20% of all pages

_EPOCH = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)


def _h64(*parts: object) -> int:
    """Deterministic 64-bit hash of the parts (md5-based, version-stable)."""
    key = "|".join(str(p) for p in parts).encode("utf-8")
    return int.from_bytes(hashlib.md5(key).digest()[:8], "big")


def _pick(seq, *key):
    return seq[_h64(*key) % len(seq)]


def url_for(i: int) -> str:
    h = SKEW_HOST if _h64(SEED, "host", i) % 5 == 0 else 1 + _h64(SEED, "h2", i) % (N_HOSTS - 1)
    return f"https://host{h}.example/page/{i}"


def lang_for(i: int) -> str:
    return _pick(LANGS, SEED, "lang", i)


def warc_ts_for(i: int) -> _dt.datetime:
    # within a 30-day window, second granularity
    return _EPOCH + _dt.timedelta(seconds=_h64(SEED, "ts", i) % (30 * 86400))


def _tokens(i: int, lang: str, n: int, lexicon=None) -> list[str]:
    lex = lexicon if lexicon is not None else LEXICONS[lang]
    return [_pick(lex, SEED, "tok", i, j) for j in range(n)]


def text_for(i: int) -> str:
    """Body text: several lines of seeded per-language prose, with
    deterministic fault injection so every quality rule + the scrub chain
    has positives (FIXTURES.md §1)."""
    lang = lang_for(i)
    lines: list[str] = []

    if i % 17 == 0:
        # too-short document
        return " ".join(_tokens(i, lang, 5))

    n_lines = 4 + _h64(SEED, "nl", i) % 6
    low_stop = i % 23 == 0
    lex = RARE_TOKENS if low_stop else LEXICONS[lang]
    for ln in range(n_lines):
        n_tok = 8 + _h64(SEED, "nt", i, ln) % 10
        toks = [_pick(lex, SEED, "tok", i, ln, j) for j in range(n_tok)]
        if i % 13 == 0 and ln % 2 == 0:
            # symbol-heavy line
            toks = [t + "@#$%" if j % 2 == 0 else t for j, t in enumerate(toks)]
        lines.append(" ".join(toks))

    if i % 11 == 0:
        # repeated n-gram spam: one trigram repeated across lines
        spam = " ".join(_tokens(i, lang, 3))
        lines = [spam + " " + spam + " " + spam for _ in range(max(4, n_lines))]

    if i % 7 == 0:
        # PII + toxicity injection
        pii = (
            f"contact user{i}@example.com or call (555) 123-{i % 10000:04d} "
            f"ssn {i % 900 + 100:03d}-{i % 90 + 10:02d}-{i % 9000 + 1000:04d} "
            f"{_pick(TOXIC_LEXICON, SEED, 'tox', i)}"
        )
        lines.insert(len(lines) // 2, pii)

    return "\n".join(lines)


def html_for(i: int, text: str) -> bytes:
    """Wrap text in boilerplate HTML (nav/script/footer noise + entities)
    so extraction is non-trivial but deterministic."""
    title = " ".join(_tokens(i, lang_for(i), 3))
    paras = "".join(
        f"<p class=\"c{j % 3}\">{_html_mod.escape(line)}</p>\n"
        for j, line in enumerate(text.split("\n"))
    )
    doc = (
        "<html><head>"
        f"<title>{_html_mod.escape(title)}</title>"
        "<script>var x = 1 < 2 && 3 > 2; track('pageview');</script>"
        "<style>.c0 { color: red; }</style>"
        "</head><body>"
        "<nav><a href=\"/\">home</a> &middot; <a href=\"/about\">about</a></nav>"
        "<header><h1>" + _html_mod.escape(title) + "</h1></header>\n"
        + paras +
        "<footer>&copy; 2024 host &amp; co</footer>"
        "</body></html>"
    )
    return doc.encode("utf-8")


def row(i: int) -> dict:
    text = text_for(i)
    return {
        "url": url_for(i),
        "warc_ts": warc_ts_for(i),
        "html": html_for(i, text),
        "text": text,
        "lang": lang_for(i),
    }


DUP_EVERY = 4  # spark_web_pages_with_dups: every 4th page gets a twin


def messy_url_for(i: int) -> str:
    """A deterministic alternate spelling of url_for(i) that
    canonical_url maps back to the same page: uppercase scheme/host,
    scheme-default port, trailing slash, fragment — variant chosen by
    the row hash so the mix is stable."""
    base = url_for(i)  # https://host{h}.example/page/{i}
    rest = base[len("https://"):]
    host, path = rest.split("/", 1)
    v = _h64(SEED, "dupv", i)
    scheme = "HTTPS" if v % 2 == 0 else "https"
    if v % 3 == 0:
        host = host.upper()
    port = ":443" if v % 5 == 0 else ""
    tail = "/" if v % 7 == 0 else ""
    frag = "#dup" if v % 2 == 1 else ""
    return f"{scheme}://{host}{port}/{path}{tail}{frag}"


def dup_row(i: int) -> dict:
    """Exact-duplicate twin of row(i): same html/text under a messy
    spelling of the url, crawled an hour later — so canonical-url
    exact dedup must collapse the pair and keep the ORIGINAL row
    (min (warc_ts, url) order)."""
    r = row(i)
    r["url"] = messy_url_for(i)
    r["warc_ts"] = r["warc_ts"] + _dt.timedelta(seconds=3600)
    return r


def pandas_web_pages(n: int, start: int = 0):
    """Small-scale eager generation → pandas DataFrame (tests / oracle)."""
    import pandas as pd

    rows = [row(i) for i in range(start, start + n)]
    df = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    df["warc_ts"] = pd.to_datetime(df["warc_ts"]).dt.tz_localize(None)
    return df


WEB_PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]
WEB_PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def _spark_pages(spark, n: int, rows_for):
    """Shared distributed-generation shape: ``spark.range(n)`` →
    ``mapInPandas``, one ``rows_for(i) -> list[dict]`` call per index.

    This is the scale path — each partition generates its own slice, so
    the table never exists in one place. At 10^12 rows you'd bump
    numPartitions; generation stays embarrassingly parallel.
    """
    # warc_ts crosses Arrow as tz-AWARE UTC: an aware pandas timestamp
    # converts to the same epoch micros under ANY session timezone,
    # whereas a naive one is interpreted in the session zone — so no
    # session conf needs to be (permanently) mutated here and a caller
    # session running in another timezone still gets byte-identical
    # warc_ts micros vs pandas_web_pages (ADVICE r4: the old
    # spark.conf.set("...timeZone","UTC") leaked into every later query
    # of the shared session)

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rows.extend(rows_for(int(i)))
            out = pd.DataFrame(rows, columns=WEB_PAGES_COLUMNS)
            out["warc_ts"] = pd.to_datetime(out["warc_ts"], utc=True)
            yield out

    n_parts = max(1, min(32, n // 64 or 1))
    return spark.range(0, n, 1, n_parts).mapInPandas(
        gen, schema=WEB_PAGES_DDL)


def spark_web_pages(spark, n: int):
    """Distributed generation of the base corpus (see _spark_pages)."""
    return _spark_pages(spark, n, lambda i: [row(i)])


def spark_web_pages_with_dups(spark, n: int, every: int = DUP_EVERY):
    """Dup-saturated corpus: the n base pages plus a messy-url exact
    twin (dup_row) for every ``every``-th page — n + n//every rows in
    which two spellings of one page must collapse to the original
    under canonical-url dedup."""
    def rows_for(i: int) -> list[dict]:
        base = row(i)
        if i % every != 0:
            return [base]
        # derive the twin from the already-generated base instead of
        # calling dup_row(i) (which regenerates text/html from scratch
        # — dozens of md5 calls paid twice per duplicated page)
        twin = dict(base, url=messy_url_for(i),
                    warc_ts=base["warc_ts"] + _dt.timedelta(seconds=3600))
        return [base, twin]

    return _spark_pages(spark, n, rows_for)
