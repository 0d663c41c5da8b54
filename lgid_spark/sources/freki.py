"""Freki document source (SURVEY §2.1 S1) — parser for the reference's
page-layout text format, written from scratch against the observable
format (/root/reference/test/mentions_test.freki:1-3,
sample/input/10.freki:1-12):

    doc_id=X page=1 block_id=1-6 bbox=... label=btlb 20 47   ← block hdr
    line=20 tag=O fonts=F4-10.9 bbox=... : text after first colon
    (blank line separates blocks)

Attribute section = whitespace-separated key=value tokens up to the
first ':' on the line; a token without '=' is glued onto the previous
value (values like lang_name=Northern Frisian contain spaces).

Spark shape: whole-file text read → mapInPandas parse (documents are
independent; parsing parallelizes per file) → the engine's `lines`
DataFrame consumed by mentions/evidence/classify.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FREKI_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("page", T.IntegerType()),
    T.StructField("block_id", T.StringType()),
    T.StructField("label", T.StringType()),
    T.StructField("lineno", T.IntegerType()),
    T.StructField("tag", T.StringType()),
    T.StructField("span_id", T.StringType()),
    T.StructField("lang_name", T.StringType()),
    T.StructField("lang_code", T.StringType()),
    T.StructField("fonts", T.StringType()),
    T.StructField("text", T.StringType()),
    # lossless round-trip fields (S8 freki sink): the verbatim pre-colon
    # attribute section of the line and the verbatim block-header line;
    # `ordinal` is the row's file order (blocks with ZERO lines — they
    # exist, e.g. sample/input/16.freki block 9-3 "ttrt 0 0" — emit one
    # placeholder row with raw_head NULL so the serializer can replay
    # them in position)
    T.StructField("raw_head", T.StringType()),
    T.StructField("block_header", T.StringType()),
    T.StructField("ordinal", T.IntegerType()),
])


def _parse_attrs(section: str) -> dict[str, str]:
    attrs: dict[str, str] = {}
    last_key = None
    for tok in section.split():
        if "=" in tok:
            k, v = tok.split("=", 1)
            attrs[k] = v
            last_key = k
        elif last_key is not None:
            attrs[last_key] += " " + tok  # value containing spaces
    return attrs


def parse_freki(content: str) -> list[tuple]:
    """One Freki file → rows of FREKI_SCHEMA."""
    rows: list[tuple] = []
    doc_id = page = block_id = label = header = None
    ordinal = 0
    block_emitted = True  # no pending header yet

    def flush_empty_block() -> None:
        # a header whose block produced no line rows still occupies a
        # position in the file — emit a placeholder (raw_head NULL,
        # empty text) so the sink can replay it; harmless downstream
        # (no span_id, no tag, empty text ⇒ no mentions/grams)
        nonlocal ordinal
        rows.append((
            doc_id, page, block_id, label, None, None, None, None, None,
            None, "", None, header, ordinal,
        ))
        ordinal += 1

    for raw in content.split("\n"):
        if not raw.strip():
            continue
        if raw.startswith("doc_id="):
            if not block_emitted:
                flush_empty_block()
            # block header: trailing "START END" linenos have no '='
            attrs = _parse_attrs(raw)
            doc_id = attrs.get("doc_id", "").split(" ")[0]
            block_id = attrs.get("block_id")
            label = attrs.get("label", "").split(" ")[0]
            header = raw
            block_emitted = False
            try:
                page = int(attrs.get("page", "0"))
            except ValueError:
                page = 0
            continue
        if raw.startswith("line="):
            head, _, text = raw.partition(":")
            attrs = _parse_attrs(head)
            try:
                lineno = int(attrs.get("line", "0"))
            except ValueError:
                # a non-plain-int line= value (e.g. 'line=20-21' merged
                # lines) must NOT drop the row — the raw_head/ordinal
                # fields exist to guarantee verbatim replay, so keep the
                # text with lineno NULL; the sink orders by ordinal
                lineno = None
            rows.append((
                doc_id, page, block_id, label, lineno,
                attrs.get("tag", "O"),
                attrs.get("span_id"),
                attrs.get("lang_name"),
                attrs.get("lang_code"),
                attrs.get("fonts"),
                text,
                head,
                header,
                ordinal,
            ))
            ordinal += 1
            block_emitted = True
    if header is not None and not block_emitted:
        flush_empty_block()
    return rows


def read_freki(spark: SparkSession, path: str) -> DataFrame:
    """Freki files under `path` → lines DataFrame (distributed parse)."""
    files = spark.read.text(path, wholetext=True)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for content in pdf["value"]:
                rows.extend(parse_freki(content))
            yield pd.DataFrame(rows, columns=FREKI_SCHEMA.fieldNames())

    return files.mapInPandas(run, schema=FREKI_SCHEMA)


def read_language_table(path: str) -> dict[str, list[str]]:
    """`name\\tcode[\\tcode…]` → {name: [codes]} (the shape the mention
    matcher consumes; normalization happens inside NameTable)."""
    table: dict[str, list[str]] = {}
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 2 and parts[0]:
                codes = sorted({c for c in parts[1:] if c})
                if codes:
                    table.setdefault(parts[0], [])
                    table[parts[0]] = sorted(set(table[parts[0]]) | set(codes))
    return table
