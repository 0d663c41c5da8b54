"""Pin the r6 columnar fused batch path (process_batch_columns) against
the untouched per-row reference functions (score / metrics_for /
drop-relevant fields / scrub_text) — bit-for-bit, including the
vectorized softmax tail and the guarded scrub/extract fast paths."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from lgid_spark.datagen import html_for, text_for
from lgid_spark.oracle.reference import (
    extract_text,
    get_langid_model,
    metrics_for,
    process_batch,
    process_batch_columns,
    scrub_text,
)

EDGE_TEXTS = [
    "", None, "   ", "\n\n\n", "a", "İNSULT @#$ 555-12-3456", "\xa0\xa0",
    "a@b.co 123-45-6789 (555) 123-4567", "€|{}[]\\~^", "w " * 200,
    "x\ny\nz", "ſß٣", "İ" * 10,
]


def _row_reference(text: str) -> dict:
    """Per-row ground truth from the UNTOUCHED oracle functions."""
    text = text or ""
    model = get_langid_model()
    lang_pred, conf, ppl = model.score(text)
    m = metrics_for(text, lang_pred)
    return {
        "extracted_text": text,
        "lang_pred": lang_pred,
        "langid_conf": conf,
        "ppl": ppl,
        "n_chars": m["n_chars"],
        "n_words": m["n_words"],
        "mean_line_len": m["mean_line_len"],
        "symbol_word_ratio": m["symbol_word_ratio"],
        "stopword_ratio": m["stopword_ratio"],
        "repetition_ratio": m["repetition_ratio"],
        "scrubbed_text": scrub_text(text),
    }


def _assert_rows_equal(a: dict, b: dict) -> None:
    assert set(a) == set(b)
    for k in a:
        va, vb = a[k], b[k]
        if isinstance(va, float) and math.isinf(va):
            assert math.isinf(vb), k
        else:
            assert va == vb, (k, va, vb)


def test_columns_match_row_reference_bitwise():
    texts = [extract_text(html_for(i, text_for(i))) for i in range(2000)]
    texts += EDGE_TEXTS
    model = get_langid_model()
    rows = process_batch(texts, model)
    assert len(rows) == len(texts)
    for t, got in zip(texts, rows):
        _assert_rows_equal(_row_reference(t), got)


def test_columns_emit_flags_subset():
    texts = [extract_text(html_for(i, text_for(i))) for i in range(200)]
    model = get_langid_model()
    full = process_batch_columns(texts, model)
    labels = process_batch_columns(
        texts, model, emit_extracted=False, emit_scrubbed=False)
    assert "extracted_text" not in labels and "scrubbed_text" not in labels
    for k in labels:
        va, vb = full[k], labels[k]
        if isinstance(va, np.ndarray):
            # inf == inf is fine elementwise here; NaN never occurs
            assert np.array_equal(va, vb), k
        else:
            assert va == vb, k


@given(st.lists(st.text(max_size=60), min_size=0, max_size=12))
@settings(max_examples=200, derandomize=True, deadline=None)
def test_columns_match_row_reference_fuzz(texts):
    model = get_langid_model()
    rows = process_batch(texts, model)
    for t, got in zip(texts, rows):
        _assert_rows_equal(_row_reference(t), got)


@pytest.mark.parametrize("n", [0, 1, 3])
def test_tiny_batches(n):
    model = get_langid_model()
    texts = EDGE_TEXTS[:n]
    rows = process_batch(texts, model)
    assert len(rows) == n
    for t, got in zip(texts, rows):
        _assert_rows_equal(_row_reference(t), got)
