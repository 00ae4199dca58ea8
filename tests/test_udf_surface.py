"""Pins for the §2.10 UDF-surface qids' edge semantics
(queries/relational5.py): RE2-compatible tokenization and NULL
handling the DuckDB twins rely on, testable at the pandas level
because the qid lambdas use exactly these expressions."""

from __future__ import annotations

import pandas as pd

TOKS = r"[^\t\n\f\r ]+"  # complement of RE2's \s class


def test_tokenizer_ascii_whitespace_only():
    """pandas' bare .str.split() would split on ALL Unicode whitespace
    (NBSP, ideographic space, ...) while DuckDB's RE2 \\s is ASCII
    — the findall form must keep Unicode-whitespace inside tokens."""
    s = pd.Series(["a b", "x　y", "p q"])
    out = s.str.findall(TOKS).str.join(" ")
    assert out.tolist() == ["a b", "x　y", "p q"]


def test_tokenizer_null_text_yields_null_not_crash():
    s = pd.Series(["a b", None, "  "])
    n = s.str.findall(TOKS).str.len().astype("Int32")
    assert n[0] == 2
    assert pd.isna(n[1])  # NULL text -> NULL count (oracle semantics)
    assert n[2] == 0
    joined = s.str.findall(TOKS).str.join(" ")
    assert joined[2] == ""  # whitespace-only -> empty, no empty tokens
