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
    # MaxScore prune for score-desc top-k disjunctions (the Block-MAX
    # WAND analog — see compiler.compile_query_topk).  Result-identical
    # to the unpruned plan; off = always score every match.
    enable_maxscore_topk: bool = True
    # COST GATE on the two-pass protocol (round-6): the seed threshold
    # pass is an extra Spark job — a fixed per-query constant (~0.3 s
    # measured in local mode, more on a real cluster's scheduler) —
    # while the prune can remove at most Σ df(query terms) rows from
    # the aggregation exchange.  Below this Σ df the exact single-job
    # plan is provably cheaper (5M rows ≈ 0.1-0.25 s of aggregation at
    # measured local throughput < the seed-job constant), so
    # compile_query_topk falls back to it; the term dfs come from the
    # dictionary collect the protocol already pays, so the gate itself
    # costs nothing.  0 = always run the two-pass protocol.
    maxscore_seed_gate_df: int = 5_000_000
    # skip the prune for very deep pages: k = limit+offset this large
    # makes τ (the K-th partial score) too small to prune much while
    # the seed top-k job grows with k (ADVICE r5: deep-offset cliff)
    maxscore_max_k: int = 10_000
    # broadcast the essential-term candidate id set into the completion
    # semi-join only below this essential-df row count (ADVICE r5:
    # estimate-free 2M-row broadcast can reach 100MB+ with string ids)
    maxscore_broadcast_df: int = 2_000_000
    # warn when a SQL aggregate can't ride the index aggregate scan
    # (reference GUC paradedb.check_aggregate_scan, issue_3050.out /
    # issue_3196.out WARNINGs)
    check_aggregate_scan: bool = True
    # MPP GUC surface (reference gucs.rs paradedb.mpp_debug /
    # paradedb.mpp_queue_size; mpp_smoke.out pins defaults, byte-unit
    # parsing, and the 64kB..1GB bounds).  mpp_debug gates extra
    # distributed-exchange logging; mpp_queue_size is the per-exchange
    # buffer budget (the Spark analog feeds maxRecordsPerBatch-style
    # sizing on Arrow exchanges) — both must be no-ops for query
    # RESULTS, which mpp_smoke's trivial-query section pins.
    mpp_debug: bool = False
    mpp_queue_size: str = "8MB"


_BYTE_UNITS = {"b": 1, "kb": 1024, "mb": 1024**2, "gb": 1024**3}


def parse_byte_size(text: str) -> int:
    """Parse a Postgres byte-unit GUC string ('64kB', '8MB', '1GB')."""
    s = str(text).strip()
    i = len(s)
    while i > 0 and not s[i - 1].isdigit():
        i -= 1
    num, unit = s[:i].strip(), s[i:].strip().lower() or "b"
    if not num or unit not in _BYTE_UNITS:
        raise ValueError(
            f'invalid value for parameter "mpp_queue_size": "{text}"')
    return int(num) * _BYTE_UNITS[unit]


def _validate_mpp_queue_size(v: str) -> None:
    # reference GUC bounds: min 64kB, max 1GB (mpp_smoke.out rejects
    # 4kB and 2GB with invalid_parameter_value)
    n = parse_byte_size(v)
    if not (64 * 1024 <= n <= 1024**3):
        raise ValueError(
            f'{n // 1024}kB is outside the valid range for parameter '
            f'"mpp_queue_size" (64kB .. 1GB)')


_VALIDATORS = {"mpp_queue_size": _validate_mpp_queue_size}


CONFIG = EngineConfig()


def set(**kw) -> EngineConfig:  # noqa: A001 - mirrors `SET paradedb.x`
    """Update engine config knobs (the ``SET paradedb.*`` analog)."""
    for k, v in kw.items():
        if not hasattr(CONFIG, k):
            raise KeyError(f"unknown config key {k!r}; known: "
                           f"{sorted(CONFIG.__dataclass_fields__)}")
        if k in _VALIDATORS:
            _VALIDATORS[k](v)
        setattr(CONFIG, k, v)
    return CONFIG


def get() -> EngineConfig:
    return CONFIG
