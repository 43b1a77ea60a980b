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
    # each stage's redacted text is MATERIALIZED into a temp column
    # (referenced twice — by the next stage's count and replace — so
    # CollapseProject keeps the projections separate): inlining the
    # growing replace chain into every derived column re-ran pattern
    # i's regexp_replace up to 4× per row (round-6, guide §1.2 — total
    # regex work drops from ~16 replaces + 8 counts to 4 + 4 for the
    # default pattern set, identical output).
    out = docs
    prev = F.col(text_col)
    n_cols = []
    for i, (label, rx) in enumerate(pats):
        nc, rc = f"n_{label.lower()}", f"__red_{i}"
        out = (out.withColumn(nc, F.regexp_count(prev, F.lit(rx)))
               .withColumn(rc, F.regexp_replace(prev, rx, f"<{label}>")))
        n_cols.append(nc)
        prev = F.col(rc)
    total: Column = F.lit(0)
    for nc in n_cols:
        total = total + F.col(nc)
    return (out.withColumn("pii_total", total)
            .withColumn(f"{text_col}_redacted", prev)
            .drop(*[f"__red_{i}" for i in range(len(pats))]))
