"""Engine configuration — the analog of the reference's GUC surface
(pg_search/src/gucs.rs, 38 ``paradedb.*`` GUCs).

Most reference GUCs toggle Postgres planner integration and have no
analog here (Catalyst owns planning); the knobs that DO carry over are
collected in one dataclass with the same spirit: session-wide, mutable
at runtime, read by the code paths at call time.

    import sparksearch.config as cfg
    cfg.set(max_expansions=100, terms_agg_default_size=50)
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field


@dataclass
class EngineConfig:
    # fuzzy/regex/prefix term-dictionary expansion cap
    # (reference: Tantivy max_expansions defaults; silent-cap is never
    # allowed — expansion warns and sets last_expansion_truncated)
    max_expansions: int = 50
    # terms bucket agg default size (reference max_term_agg_buckets guard)
    terms_agg_default_size: int = 10
    # hard cap on buckets COLLECTED per aggregation level — the result
    # envelope is driver-side, so an unbounded-cardinality histogram /
    # terms agg must abort instead of OOMing the driver (reference:
    # api/aggregate.rs bucket_limit + paradedb.max_term_agg_buckets GUC;
    # Tantivy AggregationLimits defaults to 65k buckets)
    max_agg_buckets: int = 65_000
    # persisted postings layout (reference: segment count / merge tuning)
    n_term_buckets: int = 64
    docs_per_bucket: int = 100_000
    # layered merge policy byte layers (reference layer_sizes option)
    layer_sizes: list = dc_field(default_factory=lambda: [
        100 * 1024, 1024 * 1024, 10 * 1024 * 1024])
    # streaming state
    n_salt: int = 8
    # RRF list depth (standard top-N fusion)
    rrf_depth: int = 1000
    # warn when a vector ORDER BY cannot use the TopK path because its
    # distance operator mismatches the index opclass (reference GUC
    # paradedb.check_topk_scan, vector_search_pushdown.out WARNINGs)
    check_topk_scan: bool = True
    # warn when a SQL aggregate can't ride the index aggregate scan
    # (reference GUC paradedb.check_aggregate_scan, issue_3050.out /
    # issue_3196.out WARNINGs)
    check_aggregate_scan: bool = True


CONFIG = EngineConfig()


def set(**kw) -> EngineConfig:  # noqa: A001 - mirrors `SET paradedb.x`
    """Update engine config knobs (the ``SET paradedb.*`` analog)."""
    for k, v in kw.items():
        if not hasattr(CONFIG, k):
            raise KeyError(f"unknown config key {k!r}; known: "
                           f"{sorted(CONFIG.__dataclass_fields__)}")
        setattr(CONFIG, k, v)
    return CONFIG


def get() -> EngineConfig:
    return CONFIG
