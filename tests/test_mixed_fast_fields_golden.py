"""mixed_fast_fields_bug.out golden (PUBLIC reference behavior, table
replicated inline): the Tantivy query-string set syntax
``IN [alpha beta gamma delta epsilon]`` parses to a term_set, two such
predicates AND-compose, and a numeric-only projection returns the same
rows regardless of execution method (the reference's ColumnarExec bug
corpus — 100 rows, greek × color cycles).

Ref: pg_search/tests/pg_regress/expected/mixed_fast_fields_bug.out
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query
from sparksearch.query.parser import parse_query

GREEK = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron",
         "pi", "rho", "sigma", "tau", "upsilon", "phi", "chi", "psi",
         "omega"]
COLORS = ["red", "orange", "yellow", "green", "blue", "indigo",
          "violet", "black", "white", "gray"]


@pytest.fixture(scope="module")
def bench_index(spark):
    rows = [(i, GREEK[i % 24], COLORS[i % 10], i % 1000,
             float(i % 100), float(i % 10000))
            for i in range(1, 101)]
    docs = spark.createDataFrame(
        rows, "id long, string_field1 string, string_field2 string, "
              "numeric_field1 int, numeric_field2 double, "
              "numeric_field3 double")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="string_field1",
                                 tokenizer="keyword"),
                     FieldConfig(name="string_field2",
                                 tokenizer="keyword")]))
    return idx, docs


def test_in_set_syntax_parses_to_term_set(bench_index):
    idx, _ = bench_index
    node = parse_query("IN [alpha beta gamma delta epsilon]",
                       default_field="string_field1",
                       index_schema=idx.schema)
    assert isinstance(node, ast.TermSet)
    assert node.terms == ["alpha", "beta", "gamma", "delta", "epsilon"]


EXPECTED = [(3, 3.0, 3.0), (4, 4.0, 4.0), (24, 24.0, 24.0),
            (50, 50.0, 50.0), (73, 73.0, 73.0), (74, 74.0, 74.0),
            (100, 0.0, 100.0)]


def _run(idx, docs):
    q = ast.Boolean(must=[
        parse_query("IN [alpha beta gamma delta epsilon]",
                    default_field="string_field1",
                    index_schema=idx.schema),
        parse_query("IN [red blue green]",
                    default_field="string_field2",
                    index_schema=idx.schema)])
    m = compile_query(idx, q).select("doc_id")
    out = (docs.join(m, docs["id"] == m["doc_id"])
           .orderBy("numeric_field1")
           .select("numeric_field1", "numeric_field2", "numeric_field3"))
    return [(r[0], r[1], r[2]) for r in out.collect()]


def test_numeric_only_projection_rows(bench_index):
    idx, docs = bench_index
    assert _run(idx, docs) == EXPECTED


def test_same_rows_from_saved_index(bench_index, tmp_path):
    # the reference's point: every execution method returns the same
    # data — here, the in-memory build vs the persisted segments path
    from sparksearch.index import build_and_save, SearchIndex
    idx, docs = bench_index
    path = str(tmp_path / "mffb_idx")
    build_and_save(docs, idx.schema, path, save_docs=True)
    idx2 = SearchIndex.load(docs.sparkSession, path, idx.schema)
    assert _run(idx2, idx2.docs) == EXPECTED
