"""The BASELINE.md current-numbers generator must never pick a
degraded-host bench artifact (round 5): flagged runs are skipped, and
artifacts predating the flag are judged by the same cold-pass rule."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

_SPEC = importlib.util.spec_from_file_location(
    "update_baseline_summary",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "update_baseline_summary.py"))
ubs = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(ubs)


def _write(tmp_path, name, payload, mtime):
    p = tmp_path / name
    p.write_text(json.dumps(payload))
    os.utime(p, (mtime, mtime))
    return str(p)


def test_candidate_selection_skips_degraded(tmp_path, monkeypatch):
    base = {"sf": "0.1", "cpus": 32, "pipeline_docs": 960000,
            "filter_docs_per_sec": 1.0, "queries_only_total_r1_set": 1.0}
    old_good = _write(tmp_path, "BENCH_r03.json",
                      {**base, "cold_pass_sec": 22.5}, 1000)
    legacy_bad = _write(tmp_path, "BENCH_r04.json",
                        {**base, "cold_pass_sec": 27.5}, 2000)
    flagged = _write(tmp_path, "bench_r5.json",
                     {**base, "cold_pass_sec": 29.6,
                      "degraded_host": True}, 3000)

    cands = [old_good, legacy_bad, flagged]
    chosen = max([c for c in cands if ubs.credible(c, gate=24.0)],
                 key=os.path.getmtime)
    # newest-by-mtime would pick the flagged r5 run; newest unflagged
    # would pick the 27.5 s legacy artifact; the rule picks r03
    assert chosen == old_good


def test_render_includes_headline_rows(tmp_path):
    bench = {"sf": "0.1", "cpus": 32, "pipeline_docs": 960000,
             "filter_docs_per_sec": 98765.0,
             "filter_production_docs_per_sec": 104000.0,
             "filter_labels_only_docs_per_sec": 150000.0,
             "filter_dedup_docs_per_sec": 77000.0,
             "queries_only_total_r1_set": 12.3,
             "scaling": {"docs_per_sec_at_n": 30000,
                         "docs_per_sec_at_4n": 100000, "docs": 960000,
                         "efficiency": 0.79,
                         "hw_frequency_ceiling": 0.66,
                         "efficiency_hw_normalized": 1.0}}
    block = ubs.render(bench, "/x/bench_test.json")
    assert "98,765 docs/s" in block
    assert "bench_test.json" in block
    assert "normalized scaling efficiency" in block
    assert block.startswith(ubs.BEGIN) and block.endswith(ubs.END)
