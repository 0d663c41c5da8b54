"""Driver-checkable query registry.

Each module contributes (QUERIES, ORACLE_SQL) pairs: QUERIES maps
name → callable(spark, sf_dir) → DataFrame; ORACLE_SQL maps the same
name → equivalent DuckDB SQL over the pre-registered views. Column
names/aliases MUST match between the two (driver hashes values after
sorting columns by name).

Parity rules used throughout (Spark ↔ DuckDB 1.0):
  * money aggregates go through exact decimal then cast to double
    (double-sum order-dependence would flip rounded cents);
  * integer sums are CAST(... AS BIGINT) in DuckDB (its sum(int)
    returns HUGEINT, a schema mismatch);
  * timestamps compared via unix_micros/epoch_us (exact integers);
  * every LIMIT has a total deterministic ORDER BY;
  * regex semantics pinned with (?U) on the Spark side so Java
    character classes match RE2/Python on the synthetic data.
"""

from . import advanced, coverage, relational, skew, windowed, textops, similarity  # noqa: F401


def build_registry():
    queries: dict = {}
    oracle: dict = {}
    for mod in (relational, windowed, textops, similarity, advanced, coverage, skew):
        queries.update(mod.QUERIES)
        oracle.update(mod.ORACLE_SQL)
    return queries, oracle
