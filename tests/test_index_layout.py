"""Direct (zero-shuffle) vs salted (shuffled) index layouts build the
same logical index: identical search results, corpus stats, and meta."""

from pyspark.sql import functions as F

from sparksearch.index import build_and_save
from sparksearch.query import ast, search
from sparksearch.schema import IndexSchema, FieldConfig


def _rows(idx, q):
    return [(r["id"], round(r["score"], 4))
            for r in search(idx, q, limit=20, columns=["id"]).collect()]


def test_direct_and_salted_layouts_agree(spark, tmp_path):
    from sparksearch.fixtures import mock_items
    docs = mock_items(spark)
    schema = IndexSchema(key_field="id",
                         text_fields=[FieldConfig(name="description")])
    direct = build_and_save(docs, schema, str(tmp_path / "direct"))
    salted = build_and_save(docs, schema, str(tmp_path / "salted"),
                            layout="salted")
    for q in (ast.Term("description", "keyboard"),
              ast.Parse("running shoes", field="description")):
        assert _rows(direct, q) == _rows(salted, q)
    d_stats = sorted(direct.corpus_stats.select("field", "term", "df")
                     .collect())
    s_stats = sorted(salted.corpus_stats.select("field", "term", "df")
                     .collect())
    assert d_stats == s_stats
    assert direct.meta == salted.meta


def test_direct_layout_plan_has_no_exchange(spark, tmp_path):
    """The default write plan must not shuffle: postings go straight from
    the tokenize stage to the bucketed files."""
    from sparksearch.fixtures import mock_items
    from sparksearch.index import postings_df, adaptive_buckets
    docs = mock_items(spark)
    schema = IndexSchema(key_field="id",
                         text_fields=[FieldConfig(name="description")])
    nb = adaptive_buckets(docs.count())
    p = (postings_df(docs, schema, "local")
         .withColumn("tb", F.pmod(F.xxhash64("term"), F.lit(nb)))
         .coalesce(4))
    plan = p._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_sort_by_segment_presorting(spark, tmp_path):
    """reference sort_by (sort_by.out): saved docs are range-partitioned
    and sorted, so each parquet file covers a disjoint key range."""
    import glob
    from sparksearch.fixtures import mock_items
    docs = mock_items(spark)
    schema = IndexSchema(key_field="id",
                         text_fields=[FieldConfig(name="description")],
                         sort_by="rating ASC NULLS FIRST")
    build_and_save(docs, schema, str(tmp_path / "sorted"), save_docs=True)
    files = sorted(glob.glob(str(tmp_path / "sorted/docs/part-*.parquet")))
    assert files
    ranges = []
    for f in files:
        pdf = spark.read.parquet(f).select("rating").toPandas()
        if len(pdf):
            vals = pdf["rating"].tolist()
            assert vals == sorted(vals, key=lambda v: (v is not None, v))
            ranges.append((min(v for v in vals if v is not None),
                           max(v for v in vals if v is not None)))
    # disjoint (or touching) ranges across files in order
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi <= b_lo
    # round-trip: the reloaded index still answers queries
    from sparksearch.index import SearchIndex
    idx = SearchIndex.load(spark, str(tmp_path / "sorted"), schema)
    from sparksearch.query import ast, search
    assert search(idx, ast.Term("description", "keyboard"),
                  limit=5).count() > 0


def test_partial_index_predicate(spark):
    """reference partial index (partial_index_gating.out): only
    predicate-matching rows are indexed; counts and BM25 stats reflect
    the partial corpus."""
    from pyspark.sql import functions as F
    from sparksearch.index import build_index
    from sparksearch.query import ast
    from sparksearch.query.compiler import compile_query
    rows = [(g, ['a', 'b', 'c'][g % 3], g % 2 == 0) for g in range(1, 901)]
    docs = spark.createDataFrame(rows, "id int, category string, active boolean")
    full = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="category")]))
    part = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="category")],
        predicate="active"))
    n_full = compile_query(full, ast.Term("category", "a")).count()
    n_part = compile_query(part, ast.Term("category", "a")).count()
    assert n_full == 300
    assert n_part == docs.filter("active AND category = 'a'").count()
    # stats reflect the partial corpus, not the full table
    assert part.num_docs("category") == 450
    assert part.docs.count() == 450
