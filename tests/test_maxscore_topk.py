"""MaxScore top-k pruning (the Block-MAX WAND analog).

Reference: the dynamic top-k threshold the reference publishes into
scans (pg_search scan/segmented_topk_exec.rs:17-57) and Tantivy's
Block-MAX WAND (index/reader/index.rs:840-940).  The Spark restatement
(compiler.compile_query_topk) must be RESULT-IDENTICAL to the unpruned
plan — same docs, bit-equal f32 scores — while sending provably
non-competitive postings rows into the aggregation never.
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import IndexSchema, FieldConfig, build_index
from sparksearch import config as cfg
from sparksearch.fixtures import transcripts_pdf, turn_text
from sparksearch.query import ast, search
from sparksearch.query.compiler import compile_query, compile_query_topk


@pytest.fixture(autouse=True)
def _no_seed_gate():
    """These tests pin the PRUNE's correctness at pytest scale, below
    the production cost gate (maxscore_seed_gate_df) that routes tiny
    Σ df queries to the exact plan — zero the gate so the protocol
    engages; test_seed_cost_gate pins the gate itself."""
    prev = cfg.get().maxscore_seed_gate_df
    cfg.set(maxscore_seed_gate_df=0)
    try:
        yield
    finally:
        cfg.set(maxscore_seed_gate_df=prev)


@pytest.fixture(scope="module")
def docs_index(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    return build_index(docs, IndexSchema(
        key_field="doc_id", text_fields=[FieldConfig(name="text")]))


@pytest.fixture(scope="module")
def turns_index(spark):
    """Zipf-skewed corpus (fixtures vocabulary: 'the' in almost every
    turn, rare words in ~0.1% of turns) — the shape WAND exists for."""
    pdf = transcripts_pdf(n_convs=400, seed=7)
    pdf["text"] = [turn_text(7, r.conv_id, r.turn_idx)
                   for r in pdf.itertuples()]
    pdf["tid"] = range(len(pdf))
    docs = spark.createDataFrame(pdf[["tid", "text"]])
    return build_index(docs, IndexSchema(
        key_field="tid", text_fields=[FieldConfig(name="text")]))


def _top(df, k):
    return [(r["doc_id"], r["score"]) for r in
            df.orderBy(F.col("score").desc(),
                       F.col("doc_id").asc()).limit(k).collect()]


QUERIES = [
    ast.Parse("vector OR data OR join OR batch", field="text"),
    ast.Match("text", "window agg sort data table"),
    ast.Boolean(should=[ast.Term("text", t) for t in
                        ("hash", "group", "row", "filter", "query")]),
    ast.Boolean(should=[ast.Term("text", t) for t in
                        ("dup", "batch", "small")]),
]


@pytest.mark.parametrize("k", [5, 25])
@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_pruned_topk_identical(docs_index, k, qi):
    q = QUERIES[qi]
    stats = {}
    pruned = compile_query_topk(docs_index, q, k, stats=stats)
    base = _top(compile_query(docs_index, q), k)
    if pruned is None:
        pytest.skip("shape did not qualify at this scale")
    assert _top(pruned, k) == base          # bit-equal scores, same docs
    if not stats.get("non_essential"):
        pytest.skip("qualified but protocol took the exact flat plan")


def test_skewed_corpus_prunes_the_stopword(turns_index):
    """'obsidian OR the': the stopword's df dwarfs the needle's, its ub
    is far below the K-th score of the needle's own top-k, so the
    stopword postings are non-essential — candidates come from the
    needle alone."""
    q = ast.Boolean(should=[ast.Term("text", "obsidian"),
                            ast.Term("text", "the")])
    stats = {}
    pruned = compile_query_topk(turns_index, q, 10, stats=stats)
    assert pruned is not None
    assert stats["non_essential"] == ["the"]
    assert stats["essential"] == ["obsidian"]
    # the prune is the whole point: >95% of matched postings rows never
    # reach the aggregation on this corpus
    assert stats["rows_pruned_ub"] > 20 * stats["df"]["obsidian"]
    assert _top(pruned, 10) == _top(compile_query(turns_index, q), 10)


def test_rows_through_aggregation_shrink(turns_index):
    """observe() on both plans: the pruned union aggregates a fraction
    of the rows the unpruned one does (the VERDICT ask — fewer postings
    rows, measured in-band)."""
    from pyspark.sql import Observation
    q = ast.Boolean(should=[ast.Term("text", "obsidian"),
                            ast.Term("text", "krypton"),
                            ast.Term("text", "the"),
                            ast.Term("text", "a")])
    c = compile_query_topk.__globals__["_Compiler"](turns_index)
    pairs = c._maxscore_shape(q)["pairs"]
    field, terms = pairs[0][0], [t for _, t in pairs]

    base_obs = Observation("base_rows")
    base_rows = (c._terms_scan(field, terms)
                 .observe(base_obs, F.count(F.lit(1)).alias("n"))
                 .groupBy("doc_id").agg(F.sum("score").alias("score")))
    base_top = _top(base_rows, 10)
    n_base = base_obs.get["n"]

    stats = {}
    pruned = compile_query_topk(turns_index, q, 10, stats=stats)
    assert pruned is not None and stats["non_essential"]
    # re-derive the pruned union with an observation to count its rows
    ess = c._terms_scan(field, stats["essential"])
    cand = F.broadcast(ess.select("doc_id").distinct())
    ne = (c._terms_scan(field, stats["non_essential"])
          .join(cand, "doc_id", "left_semi"))
    pr_obs = Observation("pruned_rows")
    pr_rows = (ess.unionByName(ne)
               .observe(pr_obs, F.count(F.lit(1)).alias("n"))
               .groupBy("doc_id").agg(F.sum("score").alias("score")))
    assert _top(pr_rows, 10) == base_top
    n_pruned = pr_obs.get["n"]
    assert n_pruned < n_base / 5, (n_pruned, n_base)


def test_tight_upper_bound_dominates_every_posting(docs_index, turns_index):
    """The Block-Max bound computed at (max_tf, min_len_q) through
    bm25_expr's exact f32 chain must dominate EVERY per-posting score
    of its term — the property the prune's correctness rests on."""
    import numpy as np
    c = compile_query_topk.__globals__["_Compiler"]
    for index, terms in [(docs_index, ["dup", "batch", "data"]),
                         (turns_index, ["the", "a", "obsidian"])]:
        comp = c(index)
        bounds = {}
        meta = index.term_meta("text", terms, bounds=bounds)
        assert set(bounds) == set(meta), "bounds missing from dictionary"
        cfg = index.schema.field("text")
        f32 = np.float32
        avgdl = f32(index.avg_len("text"))
        scan = comp._terms_scan("text", [t for t in terms if t in meta])
        mx = {r["term"]: r["m"] for r in
              scan.groupBy("term").agg(F.max("score").alias("m"))
              .collect()}
        for t, (max_tf, min_len_q) in bounds.items():
            w = f32(f32(index.idf("text", meta[t][0]))
                    * f32(cfg.k1 + 1.0))
            cache = f32(f32(cfg.k1) * (f32(1.0 - cfg.b)
                                       + f32(cfg.b) * f32(min_len_q)
                                       / avgdl))
            tf_f = f32(max_tf)
            ub = float(f32(w * f32(tf_f / f32(tf_f + cache))))
            assert mx[t] <= ub <= float(w), (t, mx[t], ub)


def test_search_page_uses_prune_and_matches_disabled(docs_index):
    """The public search() page is identical with the GUC on and off,
    and ineligible shapes (secondary sort first, msm=2, offset-only)
    still work."""
    q = ast.Parse("vector OR data OR join OR batch", field="text")
    on = search(docs_index, q, limit=10).collect()
    try:
        cfg.set(enable_maxscore_topk=False)
        off = search(docs_index, q, limit=10).collect()
    finally:
        cfg.set(enable_maxscore_topk=True)
    assert on == off and len(on) == 10

    # disqualified shapes take the exact plan (and stay correct)
    msm = ast.Boolean(should=[ast.Term("text", "vector"),
                              ast.Term("text", "data"),
                              ast.Term("text", "join")],
                      minimum_should_match=2)
    assert compile_query_topk(docs_index, msm, 10) is None
    assert search(docs_index, msm, limit=5).count() == 5
    by_col = search(docs_index, q, limit=5,
                    order_by=[("n_chars", "asc"), ("doc_id", "asc")])
    assert by_col.count() == 5


def test_multi_field_flat_disjunction(spark, docs_index):
    """A FLAT should across two fields prunes per (field, term) pair
    and stays bit-identical to the unpruned batched plan; the nested
    (fieldless-parse) form stays disqualified — per-child f32 casts
    can't be reproduced by one flat aggregate."""
    docs = (spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
            .withColumn("title", F.concat_ws(
                " ", F.col("lang"), F.col("source"))))
    idx = build_index(docs, IndexSchema(
        key_field="doc_id", text_fields=[FieldConfig(name="text"),
                                         FieldConfig(name="title")]))
    q = ast.Boolean(should=[ast.Term("text", "dup"),
                            ast.Term("text", "batch"),
                            ast.Term("title", "src3"),
                            ast.Term("title", "de")])
    stats = {}
    pruned = compile_query_topk(idx, q, 10, stats=stats)
    assert pruned is not None and stats["non_essential"]
    assert all(":" in lbl for lbl in stats["essential"]), \
        "multi-field stats label pairs as field:term"
    assert _top(pruned, 10) == _top(compile_query(idx, q), 10)
    # nested should-Booleans (the fieldless-parse shape) stay exact-path
    nested = ast.Boolean(should=[
        ast.Boolean(should=[ast.Term("text", "dup"),
                            ast.Term("text", "batch")]),
        ast.Boolean(should=[ast.Term("title", "src3"),
                            ast.Term("title", "de")])])
    assert compile_query_topk(idx, nested, 10) is None


@pytest.mark.parametrize("seed", range(30))
def test_random_disjunction_fuzz(turns_index, docs_index, seed):
    """Seeded random disjunctions (mixed rare/common vocab, random term
    count and k) — the pruned top-k must equal the exact plan's
    bit-for-bit whenever it engages.  30 seeds x 2 corpora cover the
    engagement boundary (τ from few-match seeds, all-common queries,
    absent terms, duplicate terms)."""
    import random
    rng = random.Random(1000 + seed)
    vocab_turns = ["the", "a", "of", "to", "run", "data", "stream",
                   "zephyr", "quasar", "obsidian", "krypton", "nimbus",
                   "zzz_missing"]
    vocab_docs = ["dup", "batch", "small", "data", "join", "vector",
                  "hash", "window", "scan", "zzz_missing"]
    for index, vocab in ((turns_index, vocab_turns),
                         (docs_index, vocab_docs)):
        n = rng.randint(2, 6)
        terms = [rng.choice(vocab) for _ in range(n)]
        k = rng.choice([1, 3, 10, 50])
        q = ast.Boolean(should=[ast.Term("text", t) for t in terms])
        pruned = compile_query_topk(index, q, k)
        if pruned is None:
            continue
        assert _top(pruned, k) == _top(compile_query(index, q), k), \
            (terms, k)


@pytest.mark.parametrize("tie", [0.0, 0.3, 1.0])
def test_dismax_pruned_identical(turns_index, docs_index, tie):
    """DisjunctionMax pages prune too: max + tie·(sum−max) is monotone
    in each added term, so the same threshold/partition argument holds
    with the dismax-specific bound ub_p + tie·Σ(others)."""
    for index, terms in ((turns_index, ["obsidian", "krypton", "the",
                                        "a"]),
                         (docs_index, ["dup", "batch", "small"])):
        q = ast.DisjunctionMax(
            disjuncts=[ast.Term("text", t) for t in terms],
            tie_breaker=tie)
        stats = {}
        pruned = compile_query_topk(index, q, 10, stats=stats)
        if pruned is None:
            continue
        assert _top(pruned, 10) == _top(compile_query(index, q), 10), \
            (terms, tie)


@pytest.mark.parametrize("seed", range(12))
def test_dismax_fuzz(turns_index, seed):
    import random
    rng = random.Random(7000 + seed)
    vocab = ["the", "a", "of", "run", "data", "zephyr", "quasar",
             "obsidian", "zzz_missing"]
    n = rng.randint(2, 5)
    q = ast.DisjunctionMax(
        disjuncts=[ast.Term("text", rng.choice(vocab))
                   for _ in range(n)],
        tie_breaker=rng.choice([0.0, 0.1, 0.5, 0.9]))
    k = rng.choice([1, 5, 20])
    pruned = compile_query_topk(turns_index, q, k)
    if pruned is not None:
        assert _top(pruned, k) == _top(compile_query(turns_index, q), k)


def test_search_with_facets_guc_equivalence(docs_index):
    """One-call page (pruned hits + FULL-match-set facets/aggregates)
    is identical with the prune on and off — the facet side must never
    see the pruned frame."""
    from sparksearch.query.search import search_with_facets
    q = ast.Parse("dup OR batch OR small", field="text")
    kw = dict(limit=5, facets={"langs": {"terms": {"field": "lang"}}})
    on = search_with_facets(docs_index, q, **kw)
    try:
        cfg.set(enable_maxscore_topk=False)
        off = search_with_facets(docs_index, q, **kw)
    finally:
        cfg.set(enable_maxscore_topk=True)
    assert on["hits"] == off["hits"] and len(on["hits"]) == 5
    assert on["aggregates"] == off["aggregates"]
    assert on["facets"] == off["facets"]
    assert on["aggregates"]["total_count"] > 5   # full match set


def test_seed_cost_gate(turns_index):
    """Round-6 cost gate: below the configured Σ df the two-pass
    protocol is skipped — compile_query_topk returns the exact flat
    plan built from the ALREADY-collected dictionary metadata (no seed
    job, no second dictionary collect) — and above it the prune
    engages exactly as before, with identical pages on both sides."""
    q = ast.Boolean(should=[ast.Term("text", "obsidian"),
                            ast.Term("text", "the")])
    dfs = turns_index.term_dfs("text", ["obsidian", "the"])
    total = sum(dfs.values())
    base = _top(compile_query(turns_index, q), 10)
    try:
        # gate above this corpus's Σ df → exact flat plan, no prune
        cfg.set(maxscore_seed_gate_df=total + 1)
        stats = {}
        gated = compile_query_topk(turns_index, q, 10, stats=stats)
        assert gated is not None and stats.get("gated_exact")
        assert "non_essential" not in stats
        assert _top(gated, 10) == base      # bit-equal to compile_query
        # gate at/below Σ df → prune engages and stays bit-identical
        cfg.set(maxscore_seed_gate_df=total)
        stats = {}
        pruned = compile_query_topk(turns_index, q, 10, stats=stats)
        assert pruned is not None and stats["non_essential"] == ["the"]
        assert _top(pruned, 10) == base
    finally:
        cfg.set(maxscore_seed_gate_df=0)   # module autouse value
    # the production default is a real gate, not zero: a toy-scale
    # disjunction must route to the exact plan out of the box
    assert cfg.EngineConfig().maxscore_seed_gate_df > total


def test_deep_page_k_cap(turns_index):
    """r5 ADVICE: a deep page (k = limit+offset beyond maxscore_max_k)
    skips the prune — and the K-th score is reduced cluster-side, so an
    in-cap deep page never collects k rows to the driver (pinned here
    by equality with the exact plan, the driver-side shape is covered
    by code review of _maxscore_scores's one-row agg collect)."""
    q = ast.Boolean(should=[ast.Term("text", "obsidian"),
                            ast.Term("text", "the")])
    prev = cfg.get().maxscore_max_k
    try:
        cfg.set(maxscore_max_k=50)
        assert compile_query_topk(turns_index, q, 51) is None
        pruned = compile_query_topk(turns_index, q, 50)
        if pruned is not None:
            assert _top(pruned, 50) == _top(
                compile_query(turns_index, q), 50)
    finally:
        cfg.set(maxscore_max_k=prev)


def test_offset_page_consistent(docs_index):
    """limit+offset paging through the pruned path equals the unpruned
    page-2 slice."""
    q = ast.Parse("vector OR data OR join OR batch", field="text")
    page2 = search(docs_index, q, limit=10, offset=10).collect()
    try:
        cfg.set(enable_maxscore_topk=False)
        want = search(docs_index, q, limit=10, offset=10).collect()
    finally:
        cfg.set(enable_maxscore_topk=True)
    assert page2 == want and len(page2) == 10
