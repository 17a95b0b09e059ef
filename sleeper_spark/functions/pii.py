"""PII detection and redaction over text columns.

A training-data pipeline has to find and mask personally-identifying
strings BEFORE packing documents into shards — after tokenization the
spans are gone. These operators are the Spark-side sweep: per-row match
counts (audit / filtering signal) and in-place masking, both as pure
JVM regex expressions (``regexp_count`` / ``regexp_replace`` inside
whole-stage codegen) — no Python in the hot path, no shuffle at all;
the scan parallelizes file-wise like any projection.

The built-in patterns deliberately use only syntax shared by Java's
regex engine and RE2-family engines (DuckDB, Go): character classes,
bounded repetition, non-capturing groups, ``\\b`` word boundaries — no
backreferences, no lookaround. That keeps every operator exactly
reproducible in a SQL oracle, and portable to any engine a downstream
consumer re-runs the audit on.

Redaction applies patterns in the fixed order of the mapping
(dict order is insertion order): an email is masked before the ipv4
pattern can eat its host digits, and each kind's mask token (e.g.
``[EMAIL]``) contains no digits or ``@``, so later patterns can never
re-match inside an earlier mask — order-stable output.

Reference analog: none (the reference has no text operators); this is
part of the beyond-reference LLM-pipeline surface, same tier as
corpus.py / dedup.py.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: kind -> (pattern, mask). Engine-portable regex subset only (see
#: module doc). Phone matches the dashed/dotted/spaced 2/3-3-3-4
#: groupings (TPC-H ``c_phone`` uses 2-3-3-4 dashed).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
              "[EMAIL]"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IPV4]"),
    "phone": (r"\b\d{2,3}[-. ]\d{3}[-. ]\d{3}[-. ]\d{4}\b", "[PHONE]"),
}


def pii_counts(df: DataFrame, text_col: str,
               patterns: dict[str, tuple[str, str]] | None = None,
               prefix: str = "n_") -> DataFrame:
    """Per-row match counts: one ``{prefix}{kind}`` int column per
    pattern, plus ``{prefix}pii`` with the total. Counts overlap-free
    per kind (regexp_count semantics: left-to-right non-overlapping),
    independent across kinds (counting does not mask). NULL text
    counts NULL — absent data is not \"clean\" data."""
    pats = PII_PATTERNS if patterns is None else patterns
    out = df
    total: Column | None = None
    for kind, (pat, _) in pats.items():
        c = F.regexp_count(F.col(text_col), F.lit(pat))
        out = out.withColumn(f"{prefix}{kind}", c)
        total = c if total is None else total + c
    assert total is not None, "patterns must be non-empty"
    return out.withColumn(f"{prefix}pii", total)


def pii_redact(df: DataFrame, text_col: str,
               patterns: dict[str, tuple[str, str]] | None = None,
               out_col: str | None = None) -> DataFrame:
    """Mask every match of every pattern, in mapping order (see module
    doc for why order is safe). Pure nested ``regexp_replace`` — one
    codegen'd projection, zero shuffle."""
    pats = PII_PATTERNS if patterns is None else patterns
    expr: Column = F.col(text_col)
    for pat, mask in pats.values():
        expr = F.regexp_replace(expr, pat, mask)
    return df.withColumn(out_col or text_col, expr)
