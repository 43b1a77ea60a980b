"""BM25 scoring — Tantivy/Lucene-parity formula and fieldnorm quantization.

Formula (verified against the reference's pg_regress goldens, e.g.
pg_search/tests/pg_regress/expected/topk_scores.out:30-37):

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    score    = idf * (k1 + 1) * tf / (tf + k1 * (1 - b + b * len_q / avgdl))
    k1 = 1.2, b = 0.75

with ``len_q`` the document token count passed through Lucene's 1-byte
"SmallFloat byte4" fieldnorm quantization (exact up to 40 tokens, then a
4-bit-mantissa float rounded *down*), and ``avgdl`` the exact (unquantized)
mean token count.  Query clauses without a natural score (range, term-set,
exists, all) contribute a constant 1.0, and boolean must/should sum the
scores of their matching clauses — both semantics visible in the goldens
(the ``rating > 2`` must-clause adds +1.0).

All score math is plain Column arithmetic — JVM-side, codegen'd, no UDFs.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F

K1 = 1.2
B = 0.75
# Lucene SmallFloat byte4: values 0..23 are free (exact); above that a
# 3-bit mantissa + implicit leading bit, truncating.
_NUM_FREE = 24


def _int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    return bits if shift == -1 else (bits | 0x08) << shift


#: byte → quantized length (monotonic, 0,1,...,40,42,44,...)
FIELD_NORMS_TABLE: list = [
    i if i < _NUM_FREE else _NUM_FREE + _int4_to_long(i - _NUM_FREE)
    for i in range(256)
]


def quantize_len(n: int) -> int:
    """Round a token count down to the nearest representable fieldnorm."""
    if n <= 40:
        return max(n, 0)
    v = min(n, FIELD_NORMS_TABLE[-1]) - _NUM_FREE
    shift = v.bit_length() - 4
    return ((v >> shift) << shift) + _NUM_FREE


def quantize_len_expr(len_col: Column) -> Column:
    """Column version of :func:`quantize_len` (pure JVM arithmetic).

    For n > 40:  v = n - 24; shift = floor(log2(v)) - 3;
    quantized = ((v >> shift) << shift) + 24.
    """
    v = (len_col - F.lit(_NUM_FREE)).cast("long")
    shift = F.floor(F.log2(v.cast("double"))).cast("int") - F.lit(3)
    p = F.pow(F.lit(2.0), shift.cast("double")).cast("long")
    big = (F.floor(v / p) * p + F.lit(_NUM_FREE))
    capped = F.least(big, F.lit(FIELD_NORMS_TABLE[-1]))
    return F.when(len_col <= 40, F.greatest(len_col, F.lit(0))).otherwise(capped).cast("int")


def idf(n_docs: int, doc_freq: int) -> float:
    """Tantivy computes idf in f32 (``Score = f32``, bm25.rs:
    ``let x = ((doc_count - doc_freq) as Score + 0.5) / (doc_freq as
    Score + 0.5); (1f32 + x).ln()``): the ratio and the 1+x sum round
    to float32 BEFORE the log.  At tiny ratios the difference is a
    whole float32 ulp of the final score — score_anti_join.out pins
    4.9947444e-05 over a df=N=10000 corpus where the all-f64 value
    is a visibly different 4.9996250e-05.  The log itself evaluates in
    double (glibc's correctly-rounded logf ≡ f64 ln of the f32 input
    here), and downstream arithmetic stays f64 — final scores round to
    f32 at the comparison surface like every other golden."""
    import numpy as np
    x = (np.float32(np.float32(n_docs - doc_freq) + np.float32(0.5))
         / np.float32(np.float32(doc_freq) + np.float32(0.5)))
    return math.log(float(np.float32(1.0) + x))


def bm25_expr(tf: Column, len_q: Column, idf_value, avgdl: float,
              k1: float = K1, b: float = B) -> Column:
    """Per-(term, doc) BM25 contribution. ``idf_value`` may be a float
    literal (single term) or a Column (term-joined idf).

    Computed in FloatType end-to-end — Tantivy's ``Score`` is f32 and
    its Bm25Weight evaluates ``weight = idf * (1 + k1)``,
    ``cache = k1 * ((1 - b) + b * fieldnorm / average_fieldnorm)`` and
    ``weight * tf / (tf + cache)`` entirely in f32; an f64 chain
    rounded once at the end lands a ulp off on some (tf, len) combos
    (snippet_json_02_advanced.out pins 0.21010332 where f64 gives
    0.21010333).  Returned as double for a stable surface schema."""
    import numpy as np

    def f32(c):
        # Spark coerces `/` (and mixed arithmetic) to double — force the
        # f32 rounding Tantivy's native f32 ops perform at every step
        return c.cast("float")

    idf_col = (idf_value if isinstance(idf_value, Column)
               else F.lit(float(idf_value)))
    lit32 = lambda v: F.lit(float(np.float32(v))).cast("float")  # noqa: E731
    w = f32(f32(idf_col) * lit32(k1 + 1.0))
    ratio = f32(f32(f32(lit32(b) * f32(len_q))) / lit32(avgdl))
    cache = f32(lit32(k1) * f32(lit32(1.0 - b) + ratio))
    tf_f = f32(tf)
    tfactor = f32(tf_f / f32(tf_f + cache))
    return f32(w * tfactor).cast("double")


def bm25_py(tf: int, length: int, n_docs: int, doc_freq: int, avgdl: float,
            k1: float = K1, b: float = B) -> float:
    """Pure-python oracle used by differential tests — same f32 chain
    as bm25_expr."""
    import numpy as np
    f = np.float32
    w = f(f(idf(n_docs, doc_freq)) * f(k1 + 1.0))
    lq = quantize_len(length)
    cache = f(f(k1) * (f(1.0 - b) + f(b) * f(lq) / f(avgdl)))
    return float(f(w * f(f(tf) / (f(tf) + cache))))
