"""Snippet/highlight projections + RRF hybrid fusion tests."""

import pytest
from pyspark.sql import functions as F

from sparksearch.highlight import with_snippet, snippet_positions_udf
from sparksearch.hybrid import rrf_fuse
from sparksearch.query import ast, search


def test_snippet_wraps_matches(mock_index):
    hits = search(mock_index, ast.Term("description", "keyboard"), limit=5,
                  columns=["id", "description"])
    out = {r["id"]: r["snippet"] for r in
           with_snippet(mock_index, hits, ast.Term("description", "keyboard"),
                        "description").collect()}
    assert out[1] == "Ergonomic metal <b>keyboard</b>"
    assert out[2] == "Plastic <b>Keyboard</b>"  # case preserved, match wrapped


def test_snippet_custom_tags_and_parse_query(mock_index):
    q = ast.Parse("running shoes", field="description")
    hits = search(mock_index, q, limit=5, columns=["id", "description"])
    out = {r["id"]: r["snippet"] for r in
           with_snippet(mock_index, hits, q, "description",
                        start_tag="<em>", end_tag="</em>").collect()}
    assert out[3] == "Sleek <em>running</em> <em>shoes</em>"
    assert out[5] == "Generic <em>shoes</em>"


def test_snippet_positions(mock_index, spark):
    udf = snippet_positions_udf(["keyboard"])
    df = mock_index.docs.filter("id in (1, 3)").select(
        "id", udf(F.col("description")).alias("pos"))
    got = {r["id"]: r["pos"] for r in df.collect()}
    assert [(p["start"], p["end"]) for p in got[1]] == [(16, 24)]
    assert got[3] is None


def test_rrf_fuse(spark):
    a = spark.createDataFrame([(1, 9.0), (2, 5.0), (3, 1.0)],
                              "doc_id int, score double")
    b = spark.createDataFrame([(3, 0.9), (2, 0.8), (4, 0.7)],
                              "doc_id int, score double")
    got = [(r["doc_id"], round(r["rrf_score"], 6))
           for r in rrf_fuse([a, b], k=60).collect()]
    # doc3: 1/63 + 1/61 ≈ 0.0322665 narrowly beats doc2: 2/62 ≈ 0.0322581
    assert got[0][0] == 3
    assert got[1][0] == 2
    assert {d for d, _ in got} == {1, 2, 3, 4}
    vals = dict(got)
    assert vals[3] == pytest.approx(round(1 / 63 + 1 / 61, 6))
    assert vals[2] == pytest.approx(round(2 / 62, 6))


def test_multi_fragment_snippets(mock_index, spark):
    """pdb.snippets: several fragments, score order vs position order,
    limit/offset (reference projections/snippet.rs:358)."""
    from sparksearch.highlight import with_snippets
    from sparksearch.index import build_index
    from sparksearch.schema import IndexSchema, FieldConfig
    long_text = ("alpha keyboard one two three four five six seven eight "
                 "nine ten eleven twelve thirteen fourteen fifteen sixteen "
                 "seventeen eighteen nineteen twenty keyboard keyboard "
                 "twenty-one twenty-two twenty-three twenty-four twenty-five "
                 "twenty-six twenty-seven twenty-eight twenty-nine thirty "
                 "thirty-one thirty-two thirty-three keyboard end")
    docs = spark.createDataFrame([(1, long_text), (2, "no match here")],
                                 "id int, body string")
    idx = build_index(docs, IndexSchema(key_field="id", text_fields=[
        FieldConfig(name="body")]))
    hits = docs
    q = ast.Term("body", "keyboard")
    out = {r["id"]: r["snippets"] for r in
           with_snippets(idx, hits, q, "body", max_chars=60).collect()}
    assert out[2] is None
    frags = out[1]
    assert len(frags) >= 2
    assert all("<b>keyboard</b>" in f for f in frags)
    # score order: the double-keyboard fragment first
    assert frags[0].count("<b>keyboard</b>") >= 2
    # position order returns the document-leading fragment first
    pos = {r["id"]: r["snippets"] for r in
           with_snippets(idx, hits, q, "body", max_chars=60,
                         sort_by="position").collect()}
    assert pos[1][0].startswith("alpha")
    # limit/offset
    lim = {r["id"]: r["snippets"] for r in
           with_snippets(idx, hits, q, "body", max_chars=60,
                         limit=1).collect()}
    assert len(lim[1]) == 1 and lim[1][0] == frags[0]
