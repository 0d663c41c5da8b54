"""Golden parity against the reference's OWN test fixture: run our
mention extractor on /root/reference/test/mentions_test.freki with the
reference's real language table and require every gold row
(test/mentions_gold_output.txt) to be found with identical spans,
names, and codes.

Despite our matcher being case-insensitive by default (documented
divergence from the reference's title-case transform), the output on
this fixture is EXACTLY the gold set — the assertions require set
equality in both directions (54/54 default, 29/29 single-longest).
"""

from __future__ import annotations

import os

import pytest

from lgid_spark.operators.mentions import NameTable, find_mentions
from lgid_spark.sources.freki import parse_freki, read_language_table

REF = "/root/reference"
FREKI = os.path.join(REF, "test", "mentions_test.freki")
GOLD = os.path.join(REF, "test", "mentions_gold_output.txt")
TABLE = os.path.join(REF, "res", "lang_table.txt")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(FREKI) and os.path.exists(GOLD) and os.path.exists(TABLE)),
    reason="reference fixtures not available",
)


def _gold_rows():
    out = []
    with open(GOLD, encoding="utf-8") as fh:
        for line in fh:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 6:
                sl, sc, el, ec = (int(x) for x in parts[:4])
                out.append((sl, sc, el, ec, parts[4], parts[5]))
    return out


def test_freki_parse_shape():
    rows = parse_freki(open(FREKI, encoding="utf-8").read())
    assert len(rows) > 20
    assert rows[0][0] == "W13-2710"
    linenos = [r[4] for r in rows]
    assert linenos == sorted(linenos)


def test_gold_mentions_exact():
    """EXACT set equality with the reference's golden output — same
    spans, names, codes, nothing missing, nothing extra (54 rows)."""
    lines = [(r[4], r[10]) for r in parse_freki(open(FREKI, encoding="utf-8").read())]
    table = NameTable(read_language_table(TABLE))
    ours = {
        (m.startline, m.startcol, m.endline, m.endcol, m.name, m.code)
        for m in find_mentions(lines, table)
    }
    gold = set(_gold_rows())
    assert gold - ours == set(), f"missing: {sorted(gold - ours)[:8]}"
    assert ours - gold == set(), f"extras: {sorted(ours - gold)[:8]}"
    assert len(gold) == 54


def test_gold_single_longest_exact():
    """single-longest-mention mode also matches its gold file exactly
    (29 rows; ties unspecified upstream happen to agree with our
    (start, name) pin on this fixture)."""
    lines = [(r[4], r[10]) for r in parse_freki(open(FREKI, encoding="utf-8").read())]
    table = NameTable(read_language_table(TABLE))
    ours = {
        (m.startline, m.startcol, m.endline, m.endcol, m.name, m.code)
        for m in find_mentions(lines, table, single_longest=True)
    }
    gold = set()
    single = os.path.join(REF, "test", "mentions_single_gold_outut.txt")
    with open(single, encoding="utf-8") as fh:
        for line in fh:
            p = line.rstrip("\n").split("\t")
            if len(p) >= 6:
                gold.add((int(p[0]), int(p[1]), int(p[2]), int(p[3]), p[4], p[5]))
    assert ours == gold and len(gold) == 29


def test_freki_merged_line_value_is_preserved(spark, tmp_path):
    """A non-plain-int line= attribute (merged lines, 'line=20-21')
    must keep the row (lineno NULL, raw_head verbatim) — dropping it
    would silently lose text from a parser whose raw_head/ordinal
    fields promise byte-exact replay."""
    from lgid_spark.sinks.freki_sink import freki_doc_text
    from lgid_spark.sources.freki import read_freki

    doc = (
        "doc_id=d1 page=1 block_id=b1 label=B line_range=20-22\n"
        "line=20 tag=O :plain text\n"
        "line=21-22 tag=O :merged line text\n"
    )
    p = tmp_path / "m.freki"
    p.write_text(doc)
    lines = read_freki(spark, str(p))
    got = {r.text: r.lineno for r in lines.collect()}
    assert got == {"plain text": 20, "merged line text": None}
    # byte-exact replay through the sink
    out = freki_doc_text(lines).collect()
    assert out[0].freki_text == doc.rstrip("\n")
