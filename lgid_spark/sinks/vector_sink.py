"""Vector-debug sink (SURVEY §2.1 S11) — the reference's .vector files
(/root/reference/lgid/main.py print_feature_vector: one line per
instance, `{id}: {feat, feat, ...}`), written as a Spark text dataset.

The instance id mirrors encode_instance_id (util.py:175; spaces in the
name become underscores, main.py:622-627), and the active feature names
are the map keys whose value is true — sorted, so output is
deterministic where the reference's dict order was not."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def feature_vector_lines(instances: DataFrame) -> DataFrame:
    """instances (FIXTURES.md §7) → one string column `value` per
    instance in the .vector line format."""
    active = F.sort_array(F.map_keys(F.map_filter("feats", lambda _, v: v)))
    inst_id = F.concat_ws(
        "-",
        "doc_id", "span_id", F.col("lineno").cast("string"),
        F.replace("lang_name", F.lit(" "), F.lit("_")), "lang_code",
    )
    return instances.select(
        F.concat(inst_id, F.lit(": "), F.array_join(active, ", "))
        .alias("value"))


def write_feature_vectors(instances: DataFrame, path: str) -> None:
    """S11: text-dataset write (one part file per partition — the
    distributed analog of the reference's one .vector file per doc)."""
    feature_vector_lines(instances).write.mode("overwrite").text(path)
