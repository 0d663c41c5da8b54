"""Profile the per-doc Python work of the quality pipeline (guide §1:
measure first). Times each stage of the fused UDF body over a batch of
synthetic docs — the same work an executor's Python worker does per
Arrow batch — and prints a per-stage breakdown plus cProfile hotspots.

Usage: python tools/profile_pipeline_py.py [n_docs]
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lgid_spark.datagen import html_for, text_for  # noqa: E402
from lgid_spark.oracle import reference as R  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    htmls = [html_for(i, text_for(i)) for i in range(n)]
    model = R.get_langid_model()

    # stage 1: extract
    t0 = time.perf_counter()
    texts = [R.extract_text(h) for h in htmls]
    t_extract = time.perf_counter() - t0

    # stage 2: fused langid+metrics+scrub (full emit)
    t0 = time.perf_counter()
    R.process_batch(texts, model)
    t_full = time.perf_counter() - t0

    # stage 2b: labels only (no scrub)
    t0 = time.perf_counter()
    R.process_batch(texts, model, emit_extracted=False, emit_scrubbed=False)
    t_labels = time.perf_counter() - t0

    # stage 3: scrub alone
    t0 = time.perf_counter()
    for t in texts:
        R.scrub_text(t)
    t_scrub = time.perf_counter() - t0

    tot = t_extract + t_full
    print(f"n_docs={n}")
    print(f"extract_text      {t_extract:7.3f}s  ({1e6*t_extract/n:7.1f} us/doc)")
    print(f"process_batch     {t_full:7.3f}s  ({1e6*t_full/n:7.1f} us/doc)")
    print(f"  labels_only     {t_labels:7.3f}s  ({1e6*t_labels/n:7.1f} us/doc)")
    print(f"  scrub alone     {t_scrub:7.3f}s  ({1e6*t_scrub/n:7.1f} us/doc)")
    print(f"extract+full      {tot:7.3f}s  -> {n/tot:,.0f} docs/s/core")

    prof = cProfile.Profile()
    prof.enable()
    texts2 = [R.extract_text(h) for h in htmls]
    R.process_batch(texts2, model)
    prof.disable()
    stats = pstats.Stats(prof)
    stats.sort_stats("cumulative").print_stats(25)


if __name__ == "__main__":
    main()
