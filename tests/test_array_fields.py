"""TEXT[] (array<string>) field indexing + snippet parity.

Ported from the reference's pg_regress expected output
(tests/pg_regress/expected/snippet_position_01_basic.out): array fields
index their elements in order (space-joined form), search matches them,
and pdb.snippet / pdb.snippet_positions render over the joined string.
"""

from pyspark.sql import functions as F

from sparksearch.highlight import (with_snippet, with_snippet_positions)
from sparksearch.index import build_index
from sparksearch.query import ast, search
from sparksearch.schema import IndexSchema, FieldConfig

ROWS = [
    (1, 'This is a test test of the snippet function with multiple test '
        'words', ['test', 'snippet', 'function']),
    (2, 'Another test of the snippet snippet function with repeated '
        'snippet words', ['test', 'test', 'function']),
    (3, 'Yet another test test test of the function function function',
     ['test', 'snippet', 'test']),
]


def _index(spark):
    docs = spark.createDataFrame(
        ROWS, "id int, content string, titles array<string>")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="content"),
                     FieldConfig(name="titles")]))
    return docs, idx


def test_array_field_search_and_snippet(spark):
    docs, idx = _index(spark)
    q = ast.Boolean(should=[ast.Term("titles", "test"),
                            ast.Term("titles", "snippet")])
    hits = search(idx, q, limit=10, columns=["id", "titles"])
    out = {r["id"]: r["snippet"]
           for r in with_snippet(idx, hits, q, "titles").collect()}
    # snippet_position_01_basic.out, titles projections
    assert out[1] == "<b>test</b> <b>snippet</b> function"
    assert out[2] == "<b>test</b> <b>test</b> function"
    assert out[3] == "<b>test</b> <b>snippet</b> <b>test</b>"
    pos = {r["id"]: [(p["start"], p["end"]) for p in r["snippet_positions"]]
           for r in with_snippet_positions(idx, hits, q, "titles").collect()}
    assert pos[1] == [(0, 4), (5, 12)]
    assert pos[2] == [(0, 4), (5, 9)]
    assert pos[3] == [(0, 4), (5, 12), (13, 17)]


def test_array_field_phrase_across_elements(spark):
    docs, idx = _index(spark)
    # contiguous positions across joined elements: 'test snippet' is a
    # phrase in doc 1 and 3's titles but not doc 2's
    got = sorted(r["id"] for r in
                 search(idx, ast.Phrase("titles", ["test", "snippet"]),
                        limit=10, columns=["id"]).collect())
    assert got == [1, 3]


def test_array_field_cross_field_isolation(spark):
    docs, idx = _index(spark)
    # querying titles must not match content-only terms
    assert search(idx, ast.Term("titles", "multiple"), limit=10,
                  columns=["id"]).count() == 0
    assert search(idx, ast.Term("content", "multiple"), limit=10,
                  columns=["id"]).count() == 1


def test_ngram_over_array_elements(spark):
    """ngram match on TEXT[] (ngram-text-array.out): grams include
    spaces WITHIN an element but never span two elements; multi-word
    conjunction match requires the words adjacent in one element."""
    from sparksearch.query import ast
    rows = [
        (1, ['The Dragon Hatchling', 'A Tale of Fire', 'Wings of Gold']),
        (2, ['PostgreSQL Database Guide', 'SQL for Beginners',
             'Advanced Queries']),
        (3, ['The Hatchling Returns', 'Dragon Slayer', 'Fire and Ice']),
        (4, ['Cooking with Dragon Fruit', 'Hatchling Care Guide']),
        (5, ['Mystery at the Library', 'The Lost Book', 'Hidden Pages']),
        (6, ['Science of Flight', 'Bird Watching 101', 'Wings and Feathers']),
        (7, ['Database Internals', 'Index Structures', 'B-Tree Deep Dive']),
        (8, ['The Dragon Chronicles', 'Rise of the Phoenix',
             'Ancient Legends']),
    ]
    docs = spark.createDataFrame(rows, "id int, all_titles array<string>")
    idx = build_index(docs, IndexSchema(key_field="id", text_fields=[
        FieldConfig(name="all_titles"),
        FieldConfig(name="all_titles_ngram", source="all_titles",
                    tokenizer="ngram",
                    tokenizer_opts={"min_gram": 4, "max_gram": 4,
                                    "prefix_only": False})]))
    # Test 1: single word, conjunction over its grams -> ids 1, 3, 4, 8
    got = sorted(r["id"] for r in
                 search(idx, ast.Match("all_titles_ngram", "Dragon",
                                       conjunction_mode=True),
                        columns=["id"]).collect())
    assert got == [1, 3, 4, 8]
    # Test 2: 'Dragon Hatchling' grams include space-spanning grams, so
    # only the doc with the words adjacent IN ONE ELEMENT matches; doc 3
    # has both words in separate elements and must NOT match
    got2 = sorted(r["id"] for r in
                  search(idx, ast.Match("all_titles_ngram",
                                        "Dragon Hatchling",
                                        conjunction_mode=True),
                         columns=["id"]).collect())
    assert got2 == [1]
