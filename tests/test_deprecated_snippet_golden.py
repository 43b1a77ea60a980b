"""deprecated_snippet.out golden (PUBLIC reference behavior, 4-row
corpus replicated inline): the deprecated ``"limit" => N, "offset" =>
M`` occurrence-paging arguments of pdb.snippet / pdb.snippet_positions
— every combination the golden pins, including NULL rows where the
offset exhausts a document's occurrences, plus the default multi-
highlight snippet and the snippets (array) surface.

Ref: pg_search/tests/pg_regress/expected/deprecated_snippet.out
     pg_search/tests/pg_regress/expected/issue_3474.out (same corpus,
     same limit/offset matrix + snippets() array surface)
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.highlight import (with_snippet, with_snippet_positions,
                                   with_snippets)
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

ROWS = [
    (1, "This is a test test of the snippet function with multiple "
        "test words"),
    (2, "Another test of the snippet snippet function with repeated "
        "snippet words"),
    (3, "Yet another test test test of the function function function"),
    (4, "test Lorem ipsum dolor sit amet...test"),
]


@pytest.fixture(scope="module")
def snip(spark):
    docs = spark.createDataFrame(ROWS, "id long, content string")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="content")]))
    q = ast.Parse("test", field="content")
    hits = (docs.join(compile_query(idx, q),
                      docs["id"] == F.col("doc_id")))
    return idx, q, hits


def _paged(snip, occ_limit, occ_offset):
    idx, q, hits = snip
    out = with_snippet(idx, hits, q, "content",
                       occ_limit=occ_limit, occ_offset=occ_offset)
    out = with_snippet_positions(idx, out, q, "content",
                                 occ_limit=occ_limit,
                                 occ_offset=occ_offset)
    rows = {r["id"]: (r["snippet"],
                      None if r["snippet_positions"] is None else
                      [list(p) for p in r["snippet_positions"]])
            for r in out.collect()}
    return [rows[i] for i in (1, 2, 3, 4)]


def test_default_all_occurrences(snip):
    got = _paged(snip, None, 0)
    assert got == [
        ("This is a <b>test</b> <b>test</b> of the snippet function "
         "with multiple <b>test</b> words",
         [[10, 14], [15, 19], [58, 62]]),
        ("Another <b>test</b> of the snippet snippet function with "
         "repeated snippet words", [[8, 12]]),
        ("Yet another <b>test</b> <b>test</b> <b>test</b> of the "
         "function function function", [[12, 16], [17, 21], [22, 26]]),
        ("<b>test</b> Lorem ipsum dolor sit amet...<b>test</b>",
         [[0, 4], [34, 38]])]


def test_limit_1(snip):
    got = _paged(snip, 1, 0)
    assert got == [
        ("This is a <b>test</b> test of the snippet function with "
         "multiple test words", [[10, 14]]),
        ("Another <b>test</b> of the snippet snippet function with "
         "repeated snippet words", [[8, 12]]),
        ("Yet another <b>test</b> test test of the function function "
         "function", [[12, 16]]),
        ("<b>test</b> Lorem ipsum dolor sit amet...test", [[0, 4]])]


def test_limit_1_offset_1(snip):
    got = _paged(snip, 1, 1)
    assert got == [
        ("This is a test <b>test</b> of the snippet function with "
         "multiple test words", [[15, 19]]),
        (None, None),
        ("Yet another test <b>test</b> test of the function function "
         "function", [[17, 21]]),
        ("test Lorem ipsum dolor sit amet...<b>test</b>", [[34, 38]])]


def test_limit_5_offset_2(snip):
    got = _paged(snip, 5, 2)
    assert got == [
        ("This is a test test of the snippet function with multiple "
         "<b>test</b> words", [[58, 62]]),
        (None, None),
        ("Yet another test test <b>test</b> of the function function "
         "function", [[22, 26]]),
        (None, None)]


def test_snippets_array_surface(snip):
    idx, q, hits = snip
    out = with_snippets(idx, hits, q, "content")
    rows = {r["id"]: list(r["snippets"]) for r in out.collect()}
    assert rows[1] == ["This is a <b>test</b> <b>test</b> of the "
                       "snippet function with multiple <b>test</b> "
                       "words"]
    assert rows[2] == ["Another <b>test</b> of the snippet snippet "
                       "function with repeated snippet words"]
    assert rows[3] == ["Yet another <b>test</b> <b>test</b> "
                       "<b>test</b> of the function function function"]
    assert rows[4] == ["<b>test</b> Lorem ipsum dolor sit "
                       "amet...<b>test</b>"]
