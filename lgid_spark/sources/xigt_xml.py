"""Xigt-style XML source (SURVEY §2.1 S6; reference consumption at
/root/reference/lgid/buildlms.py:64-95).

The reference loads ODIN Xigt corpora and keeps items from tiers with
type='odin' state='normalized' whose tag matches ^L(\\+(CR|AL|DB|SEG))*$,
taking the subject language from OLAC metadata. We re-express that as a
distributed parse: one XML document per row → mapInPandas with stdlib
ElementTree → exploded `lines` rows. No external XML package needed.

Scale shape: XML parsing is embarrassingly parallel per document; the
output is the same `lines` DataFrame every downstream operator consumes
(mentions, LM build), so this source slots in front of the whole engine.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

L_TAG_RE = re.compile(r"^L(\+(CR|AL|DB|SEG))*$")
OLAC_CODE = "{http://www.language-archives.org/OLAC/1.1/}code"

LINES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("igt_id", T.StringType()),
    T.StructField("lineno", T.IntegerType()),
    T.StructField("tag", T.StringType()),
    T.StructField("lang_code", T.StringType()),
    T.StructField("lang_name", T.StringType()),
    T.StructField("text", T.StringType()),
])


def parse_xigt_doc(doc_id: str, xml_text: str) -> list[tuple]:
    """One Xigt corpus XML → rows of normalized-tier items.

    Mirrors the reference's filters: tier type='odin' state='normalized',
    subject language from OLAC metadata, all tags kept (callers filter
    with L_TAG_RE like buildlms.py:85)."""
    rows: list[tuple] = []
    root = ET.fromstring(xml_text)
    lineno = 0
    for igt in root.iter("igt"):
        igt_id = igt.get("id", "")
        lang_code, lang_name = None, None
        for el in igt.iter():
            # namespace-insensitive localname match (dc:subject etc.)
            if el.tag.rsplit("}", 1)[-1] != "subject":
                continue
            code = el.get(OLAC_CODE) or el.get("code")
            if code:
                lang_code = code
                lang_name = (el.text or "").strip().lower()
                break
        for tier in igt.iter("tier"):
            if tier.get("type") != "odin" or tier.get("state") != "normalized":
                continue
            for item in tier.iter("item"):
                lineno += 1
                rows.append((
                    doc_id, igt_id, lineno, item.get("tag", ""),
                    lang_code, lang_name, (item.text or "").strip(),
                ))
    return rows


def read_xigt_xml(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """docs(doc_id string, xml string) → lines DataFrame."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rows.extend(parse_xigt_doc(r.doc_id, r.xml))
            yield pd.DataFrame(rows, columns=LINES_SCHEMA.fieldNames())

    return docs.mapInPandas(run, schema=LINES_SCHEMA)


def l_lines(lines: DataFrame) -> DataFrame:
    """The reference's L-line filter (buildlms.py:85)."""
    from pyspark.sql import functions as F

    return lines.filter(F.col("tag").rlike(L_TAG_RE.pattern))


def synthetic_xigt_xml(doc_id: str, n_igts: int = 3) -> str:
    """Deterministic Xigt-style corpus document for tests."""
    igts = []
    langs = [("deu", "german"), ("fra", "french"), ("spa", "spanish")]
    for k in range(n_igts):
        code, name = langs[k % len(langs)]
        igts.append(f"""
  <igt id="{doc_id}-i{k}">
    <metadata><meta><dc:subject xmlns:dc="http://purl.org/dc/elements/1.1/"
      olac:code="{code}" xmlns:olac="http://www.language-archives.org/OLAC/1.1/"
      >{name.title()}</dc:subject></meta></metadata>
    <tier type="odin" state="normalized" id="t{k}">
      <item tag="L" id="l{k}1">wort eins zwei {k}</item>
      <item tag="L+CR" id="l{k}2">drei-vier fuenf</item>
      <item tag="G" id="g{k}1">word one two {k}</item>
      <item tag="T" id="t{k}1">the translation {k}</item>
      <item tag="B" id="b{k}1">not an L line</item>
    </tier>
    <tier type="odin" state="raw" id="r{k}">
      <item tag="L" id="r{k}1">RAW must be ignored</item>
    </tier>
  </igt>""")
    body = "".join(igts)
    return (
        "<xigt-corpus xmlns:olac=\"http://www.language-archives.org/OLAC/1.1/\""
        " xmlns:dc=\"http://purl.org/dc/elements/1.1/\">"
        + body + "\n</xigt-corpus>"
    )
