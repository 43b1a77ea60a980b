"""keys_snippet_score.out golden (PUBLIC reference behavior): BM25
scores and snippets over an ngram(4,4) field with BIGINT / UUID(string) /
TIMESTAMP key_field types.  Scores are float32-exact against the
reference output; snippets must merge adjacent matched grams into one
highlight region and HTML-escape the text (blue<b>tooth</b>,
<b>blue</b>&#x27;s clues)."""

import pytest

from sparksearch import IndexSchema, FieldConfig, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

VALUES = ["bluetooth", "bluebell", "jetblue", "blue's clues", "blue bloods",
          "redness", "yellowtooth", "great white", "blue skies", "rainbow"]

BLUE_SCORES = {  # id → float32 score from the reference output
    3: 0.61846066, 2: 0.57459813, 1: 0.53654534,
    9: 0.50321954, 5: 0.47379148, 4: 0.44761515}
TOOTH_SCORES = {1: 3.022081, 7: 2.668621}

_NGRAM = dict(tokenizer="ngram",
              tokenizer_opts={"min_gram": 4, "max_gram": 4,
                              "prefix_only": False})


def _schema(key_type: str) -> IndexSchema:
    return IndexSchema(key_field="id",
                       text_fields=[FieldConfig(name="value", **_NGRAM)])


def _check_scores(idx, id_of):
    got = {r["doc_id"]: r["score"] for r in
           compile_query(idx, ast.Term("value", "blue")).collect()}
    assert set(got) == {id_of(i) for i in BLUE_SCORES}
    # same printed-float32 tolerance as test_golden_bm25 (the engine
    # computes in float64 and can differ in the last float32 ulp)
    for i, want in BLUE_SCORES.items():
        assert got[id_of(i)] == pytest.approx(want, abs=2e-6), i
    # value @@@ 'tooth': the needle ngram-analyzes to two gram terms
    got2 = {r["doc_id"]: r["score"] for r in
            compile_query(idx, ast.Parse("tooth", field="value")).collect()}
    assert set(got2) == {id_of(i) for i in TOOTH_SCORES}
    for i, want in TOOTH_SCORES.items():
        assert got2[id_of(i)] == pytest.approx(want, rel=2e-6), i


def _check_snippets(spark, idx, docs, id_of):
    from sparksearch.highlight import with_snippet
    out = {}
    for needle in ("blue", "tooth"):
        q = ast.Parse(needle, field="value")
        hits = compile_query(idx, q)
        h = hits.join(docs, hits["doc_id"] == docs["id"])
        for r in with_snippet(idx, h, q, "value").collect():
            out[(r["id"], needle)] = r["snippet"]
    assert out[(id_of(1), "blue")] == "<b>blue</b>tooth"
    # adjacent matched grams merge into ONE region
    assert out[(id_of(1), "tooth")] == "blue<b>tooth</b>"
    assert out[(id_of(7), "tooth")] == "yellow<b>tooth</b>"
    assert out[(id_of(3), "blue")] == "jet<b>blue</b>"
    # HTML escaping of the un-highlighted text (reference &#x27;)
    assert out[(id_of(4), "blue")] == "<b>blue</b>&#x27;s clues"
    assert out[(id_of(5), "blue")] == "<b>blue</b> bloods"
    assert out[(id_of(9), "blue")] == "<b>blue</b> skies"


def test_bigint_key_golden(spark):
    docs = spark.createDataFrame(
        [(i + 1, v) for i, v in enumerate(VALUES)], "id long, value string")
    idx = build_index(docs, _schema("long"))
    _check_scores(idx, lambda i: i)
    _check_snippets(spark, idx, docs, lambda i: i)


UUIDS = ["f159c89e-2162-48cd-85e3-e42b71d2ecd0",
         "38bf27a0-1aa8-42cd-9cb0-993025e0b8d0",
         "b5faacc0-9eba-441a-81f8-820b46a3b57e",
         "eb833eb6-c598-4042-b84a-0045828fceea",
         "ea1181a0-5d3e-4f5f-a6ab-b1354ffc91ad",
         "28b6374a-67d3-41c8-93af-490712f9923e",
         "f6e85626-298e-4112-9abb-3856f8aa046a",
         "88345d21-7b89-4fd6-87e4-83a4f68dbc3c",
         "40bc9216-66d0-4ae8-87ee-ddb02e3e1b33",
         "02f9789d-4963-47d5-a189-d9c114f5cba4"]


def test_uuid_key_golden(spark):
    docs = spark.createDataFrame(
        list(zip(UUIDS, VALUES)), "id string, value string")
    idx = build_index(docs, _schema("string"))
    _check_scores(idx, lambda i: UUIDS[i - 1])
    _check_snippets(spark, idx, docs, lambda i: UUIDS[i - 1])


def test_timestamp_key_golden(spark):
    import datetime as dt
    base = dt.datetime(2023, 5, 3, 8, 9, 10)
    keys = [base + dt.timedelta(days=k, hours=k, minutes=k, seconds=k)
            for k in range(10)]
    docs = spark.createDataFrame(
        list(zip(keys, VALUES)), "id timestamp, value string")
    idx = build_index(docs, _schema("timestamp"))
    _check_scores(idx, lambda i: keys[i - 1])
