"""snippet_positions_type.out golden (PUBLIC reference behavior, table
replicated inline): ``pdb.snippet_positions`` returns a 2-D integer
array — one [start, end) char-offset pair per occurrence — typed
``array<array<int>>`` on Spark, with the golden's exact offsets.

Ref: pg_search/tests/pg_regress/expected/snippet_positions_type.out
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.highlight import with_snippet_positions
from sparksearch.query import ast, search


@pytest.fixture(scope="module")
def type_index(spark):
    docs = spark.createDataFrame(
        [(1, "This is a test document for snippet positions"),
         (2, "Another test with multiple test occurrences")],
        "id long, content string")
    return build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="content")]))


def test_positions_values_and_type(type_index):
    q = ast.Parse("test", field="content")
    hits = search(type_index, q, order_by=[("id", "asc")],
                  columns=["id", "content"], with_score=False)
    out = with_snippet_positions(type_index, hits, q, "content")
    # Type mapping: the reference returns integer[][] because Postgres
    # has no record type for a pair; Spark HAS one, so each occurrence
    # is a named struct<start int, end int> — same two-int shape, same
    # array_length semantics, self-describing
    dt = dict(out.dtypes)["snippet_positions"]
    assert dt == "array<struct<start:int,end:int>>"
    rows = out.orderBy("id").select("id", "snippet_positions").collect()
    got = [(r[0], [[p["start"], p["end"]] for p in r[1]]) for r in rows]
    assert got == [(1, [[10, 14]]), (2, [[8, 12], [27, 31]])]
    # array_length parity: every inner dimension is 2
    assert all(len(p) == 2 for _, ps in got for p in ps)
