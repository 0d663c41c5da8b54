"""lgid_spark — a PySpark-native analytics engine for web-text quality filtering.

A from-scratch re-expression (NOT a port) of the query/data-processing
capabilities of the xigt/lgid reference (language identification of
linguistic examples) as an idiomatic PySpark DataFrame pipeline:

* language-ID (hashed char-n-gram linear model, broadcast, Arrow pandas UDF)
* KenLM-style char-n-gram perplexity scoring
* Gopher/C4-style heuristic quality rules (pure Spark SQL expressions)
* regex PII/toxicity scrub (Python-`re`-pinned for byte parity with the oracle)
* mention extraction + windowed evidence features (lgid's signature ops,
  see /root/reference/lgid/analyzers.py, features.py)
* web-scale training-data ops: exact/MinHash-LSH/SimHash dedup, n-gram
  Jaccard, embedding ANN, token stats, fingerprinting
* url-hash bucketed partitioning, salted repartition, per-partition lineage
  rows and idempotent resume.

Everything is DataFrame/SQL + Arrow-batched pandas UDFs; zero per-row
Python UDFs; no RDDs.
"""

__version__ = "0.1.0"
