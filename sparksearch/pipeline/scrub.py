"""PII scrubbing for training-data pipelines.

Pre-training corpora are routinely scrubbed of emails, phone numbers,
IP addresses and government-id-shaped strings before the tokenizer ever
sees them.  The patterns here are deliberately conservative,
RE2-compatible (no lookarounds/backreferences), and evaluated entirely
JVM-side with ``regexp_replace``/``regexp_count`` column expressions —
one codegen'd projection per doc, no UDF, embarrassingly parallel at
100 TB.  Being plain regular expressions, a DuckDB twin runs the same
patterns, so redaction output is value-checkable row by row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column, functions as F

# order matters: emails contain dots/digits that the looser patterns
# could otherwise clip first
PII_PATTERNS = [
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("IP", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"),
    ("SSN", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("PHONE", r"\+?[0-9][0-9()\-\s]{7,}[0-9]"),
]


def redact_pii(docs: DataFrame, text_col: str = "text",
               patterns: list | None = None) -> DataFrame:
    """Replace each PII match with ``<LABEL>`` and add per-label match
    counts (``n_email`` etc.) plus ``pii_total``.  Counts are what each
    stage ACTUALLY replaced — pattern i counts on the text already
    redacted by patterns < i — so overlapping shapes (an SSN is also a
    valid phone-number string) are attributed once, to the earliest,
    most specific pattern."""
    pats = patterns or PII_PATTERNS
    out = docs
    total: Column = F.lit(0)
    red = F.col(text_col)
    for label, rx in pats:
        c = F.regexp_count(red, F.lit(rx))
        out = out.withColumn(f"n_{label.lower()}", c)
        total = total + c
        red = F.regexp_replace(red, rx, f"<{label}>")
    return (out.withColumn("pii_total", total)
            .withColumn(f"{text_col}_redacted", red))
