"""Dataset-curation sampling for training-data pipelines.

Large-scale corpus curation constantly re-balances data before
training: cap over-represented sources, up/down-weight languages by a
temperature exponent (the multilingual-LM data recipe), or take an
exact per-stratum random fraction.  All three operators here are
deterministic given a seed, shuffle-light, and scale-safe:

- :func:`stratified_sample` — per-stratum Bernoulli fractions via
  Spark's native ``sampleBy`` (one scan, no shuffle).
- :func:`balanced_sample` — EXACTLY ``n`` rows per group, chosen by a
  seeded md5 hash order (a deterministic uniform permutation — the
  same rows come back on every engine, so a SQL twin can verify
  row-for-row).
- :func:`temperature_resample` — group g with share p_g is resampled
  to a target ∝ p_g^alpha (alpha<1 flattens the distribution, the
  standard temperature recipe); row selection is the same seeded hash
  rank, so the output is deterministic end-to-end.

The hash rank is ``md5(concat(key, ':', seed))``: md5 exists in both
Spark and DuckDB with identical output, making the selection (not just
the counts) oracle-checkable — same discipline as the dedup/fingerprint
oracles.  At 100 TB the rank-per-group is one hash + one shuffle on the
group key with a window top-n; no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _rank_in_group(docs: DataFrame, group_col: str, key_col: str,
                   seed: int):
    """Deterministic per-group rank: rows ordered by the seeded md5 of
    their key (a uniform permutation), ties impossible for distinct
    keys."""
    h = F.md5(F.concat_ws(":", F.col(key_col).cast("string"),
                          F.lit(str(seed))))
    w = Window.partitionBy(group_col).orderBy(h.asc(),
                                              F.col(key_col).asc())
    return F.row_number().over(w)


def stratified_sample(docs: DataFrame, strata_col: str,
                      fractions: dict, seed: int = 7,
                      default: float = 0.0) -> DataFrame:
    """Per-stratum Bernoulli sampling (``df.sampleBy``): strata absent
    from ``fractions`` get ``default``.  One scan, no shuffle; counts
    are binomial around fraction·n (exact-count needs
    :func:`balanced_sample`)."""
    strata = {r[0] for r in docs.select(strata_col).distinct().collect()}
    full = {s: float(fractions.get(s, default)) for s in strata}
    return docs.sampleBy(strata_col, full, seed)


def balanced_sample(docs: DataFrame, group_col: str, n_per_group: int,
                    key_col: str, seed: int = 7) -> DataFrame:
    """Exactly ``min(n, group_size)`` rows per group, selected by the
    seeded hash permutation — the "cap every source at N documents"
    curation op.  Deterministic: same seed → same rows, on any engine
    that computes the same md5."""
    r = _rank_in_group(docs, group_col, key_col, seed)
    return (docs.withColumn("__r", r)
            .filter(F.col("__r") <= n_per_group).drop("__r"))


def temperature_targets(counts: dict, alpha: float,
                        total: int | None = None) -> dict:
    """Per-group row targets ∝ (share)^alpha, capped at group size —
    pure function shared by the operator and its DuckDB oracle twin so
    the (python-rounded) targets are identical on both sides."""
    n_total = sum(counts.values())
    if total is None:
        total = n_total
    weights = {g: (c / n_total) ** alpha for g, c in counts.items()}
    z = sum(weights.values()) or 1.0
    return {g: min(counts[g], int(round(total * w / z)))
            for g, w in weights.items()}


def temperature_resample(docs: DataFrame, group_col: str,
                         key_col: str, alpha: float = 0.7,
                         total: int | None = None,
                         seed: int = 7) -> DataFrame:
    """Resample groups to targets ∝ (group share)^alpha.

    ``alpha=1`` keeps the natural distribution, ``alpha=0`` fully
    balances, the usual 0.3-0.7 range flattens heavy-tailed source or
    language mixes.  ``total`` defaults to the input row count (pure
    re-balance).  Targets are capped at the group's size (this operator
    downsamples; upsampling-with-replacement is a training-loader
    concern, not a storage op).  Selection per group is the same seeded
    hash rank as :func:`balanced_sample`, so the full output is
    deterministic and SQL-twin-checkable."""
    counts = {r[0]: r[1] for r in
              docs.groupBy(group_col).count()
              .limit(100_001).collect()}
    if len(counts) > 100_000:
        # the targets map is driver-side state and a literal in the
        # plan: temperature re-balancing is for LOW-cardinality mix
        # columns (language, source); a high-cardinality group column
        # is almost certainly a mistake (e.g. the doc key)
        raise ValueError(
            f"temperature_resample: {group_col!r} has >100000 distinct "
            "values; use a low-cardinality mix column (lang/source)")
    targets = temperature_targets(counts, alpha, total)
    r = _rank_in_group(docs, group_col, key_col, seed)
    tgt = F.create_map(*[F.lit(x) for kv in targets.items() for x in kv])
    return (docs.withColumn("__r", r)
            .filter(F.col("__r") <= tgt[F.col(group_col)]).drop("__r"))
