"""Freki-format sink (SURVEY §2.1 S8) — the reference's write_to_files
(/root/reference/lgid/main.py:242-277): annotate span lines with the
predicted language and serialize documents back to `.freki` text.

Round-trip guarantee: `read_freki` keeps each line's pre-colon attribute
section and each block's header line verbatim (sources/freki.py
raw_head/block_header), so serializing an UNANNOTATED document
reproduces the input file byte-for-byte (tested against
/root/reference/sample/input/10.freki). Annotations append/replace
` lang_name=… lang_code=…` in the attribute section; the reference's
FrekiDoc re-renders lines through an external package whose exact
spacing is not observable, so annotated output is defined by THIS
serializer and verified by parsing it back.

Annotation semantics (main.py:242-277): per span, each L-line's
prediction is applied to every span line with lineno >= that L-line —
sequential overwrites mean a line carries the prediction of the LATEST
L-line at-or-before it. The name is title-cased (main.py:264).

Scale shape: assembly is one applyInPandas per doc (documents are
independent), and the writer runs foreachPartition on the executors —
on a cluster this targets a shared filesystem, exactly like the
reference's per-file output directory.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# an attribute value extends until the next token containing '='
# (sources/freki.py _parse_attrs gluing rule)
_LANG_ATTR_RE = re.compile(
    r"\s*lang_(?:name|code)=\S*(?:\s+(?![^\s=]+=)\S+)*")


@F.pandas_udf(T.StringType())
def _py_title_udf(s):
    """Python str.title semantics (main.py:264 `pred[0].title()`):
    capitalize after ANY non-letter — "ma'anyan" → "Ma'Anyan" — where
    Spark's initcap capitalizes only after whitespace ("Ma'anyan")."""
    return s.str.title()


def annotate_lines(
    lines: DataFrame, predictions: DataFrame, titlecase: bool = True
) -> DataFrame:
    """Attach pred_lang_name/pred_lang_code to span lines.

    predictions: (doc_id, span_id, lineno, lang_name, lang_code) — one
    row per L-line (classify_documents output). A span line receives the
    prediction of the latest L-line with pred lineno <= line lineno
    (write_to_files overwrite order, main.py:255-268); lines above the
    first L-line stay unannotated. `titlecase=False` keeps raw
    lowercase names (the parquet sink's structured output)."""
    cand_name = (_py_title_udf(F.col("lang_name")) if titlecase
                 else F.col("lang_name"))
    pred = predictions.select(
        "doc_id", "span_id",
        F.col("lineno").alias("pred_lineno"),
        cand_name.alias("cand_name"),
        F.col("lang_code").alias("cand_code"),
    )
    applicable = (
        lines.select("doc_id", "span_id", "lineno")
        .where(F.col("span_id").isNotNull())
        .join(pred, ["doc_id", "span_id"])
        .where(F.col("pred_lineno") <= F.col("lineno"))
    )
    # max(struct) instead of a max-over-window + equality filter: the
    # window form KEEPS BOTH rows when predictions carry a duplicate /
    # tied (doc_id, span_id, lineno) — the left join below would then
    # duplicate physical lines in the rendered .freki text. The struct
    # aggregate picks exactly one winner (latest pred_lineno, ties
    # broken deterministically by name then code) and is map-side
    # combinable besides.
    latest = (
        applicable
        .groupBy("doc_id", "span_id", "lineno")
        .agg(F.max(F.struct("pred_lineno", "cand_name", "cand_code"))
             .alias("_w"))
        .select(
            "doc_id", "span_id", "lineno",
            F.col("_w.cand_name").alias("pred_lang_name"),
            F.col("_w.cand_code").alias("pred_lang_code"),
        )
    )
    return lines.join(latest, ["doc_id", "span_id", "lineno"], "left")


def _set_lang_attrs(head: str, name: str, code: str) -> str:
    head = _LANG_ATTR_RE.sub("", head)
    return f"{head.rstrip()} lang_name={name} lang_code={code}"


def freki_doc_text(lines: DataFrame) -> DataFrame:
    """lines (FREKI_SCHEMA [+ pred_lang_name/pred_lang_code]) →
    (doc_id, freki_text): blocks in first-lineno order, lines joined by
    newlines, blocks separated by a blank line, no trailing newline —
    the byte layout of the sample corpus."""
    has_pred = "pred_lang_name" in lines.columns

    def assemble(pdf):
        import pandas as pd

        # file order: `ordinal` when the parser provided it (it places
        # zero-line blocks correctly), else lineno
        if "ordinal" in pdf.columns and pdf["ordinal"].notna().all():
            pdf = pdf.sort_values("ordinal")
        else:
            pdf = pdf.sort_values("lineno")
        blocks: list[list[str]] = []
        cur_header = None
        for row in pdf.itertuples(index=False):
            head = row.raw_head
            if row.block_header != cur_header:
                cur_header = row.block_header
                blocks.append([row.block_header])
            if head is None or (isinstance(head, float)):
                # zero-line block placeholder: the corpus convention
                # (16.freki block 9-3) renders header + one empty line
                blocks[-1].append("")
                continue
            if has_pred and isinstance(row.pred_lang_name, str):
                head = _set_lang_attrs(
                    head, row.pred_lang_name, row.pred_lang_code)
            blocks[-1].append(f"{head}:{row.text}")
        text = "\n\n".join("\n".join(b) for b in blocks)
        return pd.DataFrame(
            {"doc_id": [pdf["doc_id"].iloc[0]], "freki_text": [text]})

    return lines.groupBy("doc_id").applyInPandas(
        assemble, schema=T.StructType([
            T.StructField("doc_id", T.StringType()),
            T.StructField("freki_text", T.StringType()),
        ]))


def write_freki(doc_text: DataFrame, out_dir: str) -> None:
    """(doc_id, freki_text) → {out_dir}/{doc_id}.freki, written from the
    executors (shared filesystem on a cluster)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_part(rows):
        for row in rows:
            path = os.path.join(out_dir, f"{row['doc_id']}.freki")
            with open(path, "w", encoding="utf-8") as fh:
                fh.write(row["freki_text"])

    doc_text.foreachPartition(write_part)


def write_labelled_freki(
    lines: DataFrame, predictions: DataFrame, out_dir: str
) -> None:
    """The full S8 sink: annotate + serialize + write."""
    write_freki(freki_doc_text(annotate_lines(lines, predictions)), out_dir)
