"""Rewrite the registry-count lines in README.md / COVERAGE.md from
`entry_queries` itself (VERDICT r2 item 10: three hand-fix commits in
round 2 chased drifting literals). Run after adding/retiring queries:

    python tools/update_doc_counts.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lgid_spark.entry_queries import ORACLE_SQL, QUERIES, RETIRED_QUERIES  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_Q, N_O, N_R = len(QUERIES), len(ORACLE_SQL), len(RETIRED_QUERIES)

SUBS = [
    ("README.md",
     r"the driver-checkable registry \(\d+ queries, \d+ with",
     "the driver-checkable registry ({} queries, {} with".format(N_Q, N_O)),
    ("COVERAGE.md",
     r"registry: \*\*\d+ queries, \d+ DuckDB-oracled\*\*",
     "registry: **{} queries, {} DuckDB-oracled**".format(N_Q, N_O)),
]


def main() -> int:
    for fname, pat, repl in SUBS:
        path = os.path.join(ROOT, fname)
        src = open(path).read()
        new = re.sub(pat, repl, src)
        if new != src:
            open(path, "w").write(new)
            print("updated " + fname)
    print("registry: {} queries / {} oracled / {} retired-to-pytest".format(
        N_Q, N_O, N_R))
    return 0


if __name__ == "__main__":
    sys.exit(main())
