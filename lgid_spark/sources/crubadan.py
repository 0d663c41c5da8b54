"""Crúbadán-style LM source (SURVEY §2.1 S4; reference at
/root/reference/lgid/util.py:114-173 `read_crubadan_language_model`).

The reference resolves per-language n-gram files through a directory
index CSV (`crubadan_directory_index.csv`, util.py:133-143) mapping
(name, code) → data directory, then reads `-chartrigrams.txt`,
`-words.txt`, `-wordbigrams.txt` files of `ngram<tab>count` rows.

Re-expressed: the index is a broadcast dimension; the per-language
files become one partitioned table via a distributed parse — after
which everything downstream (broadcast set membership, match ratios)
is the same machinery as the ODIN LM (operators/lm.py).
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

GRAM_FILES = {
    "char": "-chartrigrams.txt",
    "word": "-words.txt",
    "wordbigram": "-wordbigrams.txt",
}

LM_SCHEMA = T.StructType([
    T.StructField("lang_code", T.StringType()),
    T.StructField("gram_type", T.StringType()),
    T.StructField("ngram", T.StringType()),
    T.StructField("count", T.LongType()),
])


def read_dir_index(spark: SparkSession, path: str) -> DataFrame:
    """Directory-index CSV → broadcast dim (name, code, directory).

    Read POSITIONALLY like the reference (util.py:133-143 discards the
    header row and takes row[0]=name, row[1]=iso, row[2]=directory), so
    the real index header `language_name,iso_code,crubadan_directory`
    and any other spelling both work."""
    df = spark.read.option("header", "true").csv(path)
    c0, c1, c2 = df.columns[:3]
    return df.select(
        F.col(c0).alias("name"),
        F.col(c1).alias("code"),
        F.trim(F.col(c2)).alias("directory"),
    )


def gram_file_path(base_dir: str, directory: str, suffix: str) -> str:
    """util.py:159-160: gram files are prefixed with the SECOND
    underscore component of the directory name (`aaa_aaa` → `aaa`),
    not the full directory name."""
    parts = directory.split("_")
    prefix = parts[1] if len(parts) > 1 else directory
    return os.path.join(base_dir, directory, prefix + suffix)


def read_crubadan_lm(
    spark: SparkSession,
    index: DataFrame,
    base_dir: str,
    codes: list[str] | None = None,
) -> DataFrame:
    """Resolve each (code → directory) through the index and parse its
    n-gram files into the lm_ngrams shape. The per-doc language pruning
    of the reference (main.py:567-576) is the `codes` filter — only the
    requested languages' files are listed and read."""
    rows = index.select("code", "directory").distinct()
    if codes is not None:
        rows = rows.where(F.col("code").isin(codes))
    # the index is tiny: resolve file paths driver-side, parse
    # distributed; ragged/empty directory fields are skipped like the
    # reference's except-and-continue (util.py:157-162), not crashed on
    tasks = [
        (r["code"], gram_type,
         gram_file_path(base_dir, r["directory"], suffix))
        for r in rows.collect() if r["directory"]
        for gram_type, suffix in GRAM_FILES.items()
    ]
    task_df = spark.createDataFrame(tasks, "lang_code string, gram_type string, path string")

    def parse(batches: Iterator) -> Iterator:
        import pandas as pd
        from pyarrow import fs as pafs

        def fs_for(path: str):
            # executor-side filesystem resolution: os.path/open only
            # work for POSIX paths mounted on every worker, and
            # os.path.exists is ALWAYS False for hdfs://s3a:// URIs —
            # pyarrow.fs speaks those schemes from plain Python workers
            if "://" in path:
                return pafs.FileSystem.from_uri(path)
            return pafs.LocalFileSystem(), path

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                filesystem, p = fs_for(r.path)
                if (filesystem.get_file_info(p).type
                        == pafs.FileType.NotFound):
                    continue  # missing gram file ⇒ skip (util.py:149-153)
                with filesystem.open_input_stream(p) as fh:
                    data = fh.read().decode("utf-8")
                for line in data.splitlines():
                    # tab-separated rows keep the gram BYTE-EXACT (a
                    # padded char trigram like ' zi' has a meaningful
                    # leading space); space-separated rows — the form
                    # real Crúbadán archives use — get the reference's
                    # any-whitespace parse (util.py:169: count = last
                    # token, gram = the rest). A tab-only split would
                    # silently drop every row of a space-separated file.
                    if "\t" in line:
                        gram, _, cnt = line.rstrip("\n").rpartition("\t")
                    else:
                        parts = line.split()
                        if len(parts) < 2:
                            continue
                        gram, cnt = " ".join(parts[:-1]), parts[-1]
                    if gram:
                        try:
                            out.append((r.lang_code, r.gram_type,
                                        gram, int(cnt)))
                        except ValueError:
                            continue
            yield pd.DataFrame(out, columns=LM_SCHEMA.fieldNames())

    return task_df.repartition(max(1, len(tasks))).mapInPandas(
        parse, schema=LM_SCHEMA)


def write_synthetic_crubadan(base_dir: str, langs: dict[str, list[str]]) -> str:
    """Test fixture: synthesize a dir-index + per-language gram files
    in the REAL Crúbadán layout (header `language_name,iso_code,
    crubadan_directory`, directory `xx_yyy`, files prefixed with the
    second underscore component); returns the index CSV path."""
    os.makedirs(base_dir, exist_ok=True)
    index_path = os.path.join(base_dir, "crubadan_directory_index.csv")
    with open(index_path, "w", encoding="utf-8") as idx:
        idx.write("language_name,iso_code,crubadan_directory\n")
        for code, words in sorted(langs.items()):
            d = f"xx_{code}"
            idx.write(f"{code}-name,{code},{d}\n")
            os.makedirs(os.path.join(base_dir, d), exist_ok=True)
            with open(os.path.join(base_dir, d, code + "-words.txt"), "w",
                      encoding="utf-8") as fh:
                for k, w in enumerate(words):
                    fh.write(f"{w}\t{len(words) - k}\n")
            with open(os.path.join(base_dir, d, code + "-chartrigrams.txt"),
                      "w", encoding="utf-8") as fh:
                grams: dict[str, int] = {}
                for w in words:
                    p = f" {w} "
                    for i in range(len(p) - 2):
                        grams[p[i:i + 3]] = grams.get(p[i:i + 3], 0) + 1
                for g, c in sorted(grams.items()):
                    fh.write(f"{g}\t{c}\n")
    return index_path
