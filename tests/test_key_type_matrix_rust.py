"""Key-field type matrix — rust-suite parity (PUBLIC reference
behavior, corpora replicated inline from tests/tests/key.rs): every
supported key_field data type carries the SAME ngram(4,4) BM25 search
with the same float32-pinned scores — the key type never perturbs
scoring, ordering, or match sets.

Reference key types → Spark column types: BOOLEAN→boolean,
SMALLINT/INT/BIGINT→short/int/long, FLOAT4/FLOAT8→float/double,
NUMERIC→decimal(3,1), TEXT/UUID→string, DATE→date,
TIMESTAMP(TZ)→timestamp.  TIME / TIMETZ / INET have no Spark primitive
— the engine's documented mapping is a string key carrying the
Postgres canonical text form (key.rs pins the CAST(id AS TEXT)
renderings; inet shows the /32-suppressed canonical form that
py_canon_inet produces).

Ref: tests/tests/key.rs:26-887 (boolean_key .. inet_key)
"""

import datetime as dt
from decimal import Decimal

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

VALUES = ["bluetooth", "bluebell", "jetblue", "blue's clues",
          "blue bloods", "redness", "yellowtooth", "great white",
          "blue skies", "rainbow"]

# key.rs pins the same six (1-based corpus position → float32 score)
# for every 10-row key type
BLUE_SCORES = {3: 0.61846066, 2: 0.57459813, 1: 0.53654534,
               9: 0.50321954, 5: 0.47379148, 4: 0.44761515}

_NGRAM = dict(tokenizer="ngram",
              tokenizer_opts={"min_gram": 4, "max_gram": 4,
                              "prefix_only": False})

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

# (label, spark DDL type, keys[0..9]) — keys in corpus order
MATRIX = [
    ("i16", "short", list(range(1, 11))),
    ("i32", "int", list(range(1, 11))),
    ("i64", "long", list(range(1, 11))),
    ("f32", "float", [1.1, 2.2, 3.3, 4.4, 5.5, 6.6, 7.7, 8.8, 9.9, 10.1]),
    ("f64", "double", [1.1, 2.2, 3.3, 4.4, 5.5, 6.6, 7.7, 8.8, 9.9, 10.1]),
    ("numeric", "decimal(3,1)",
     [Decimal(s) for s in ("1.1 2.2 3.3 4.4 5.5 6.6 7.7 8.8 9.9 10.1"
                           .split())]),
    ("uuid", "string", UUIDS),
    ("date", "date",
     [dt.date(2023, 5, 3) + dt.timedelta(days=k) for k in range(10)]),
    ("timestamp", "timestamp",
     [dt.datetime(2023, 5, 3, 8, 9, 10)
      + dt.timedelta(days=k, hours=k, minutes=k, seconds=k)
      for k in range(10)]),
    # TIMESTAMPTZ: key.rs renders in UTC (+00); Spark timestamps are
    # session-tz'd UTC instants — same instants as the golden's output
    ("timestamptz", "timestamp",
     [dt.datetime(2023, 5, 3, 13, 9, 10), dt.datetime(2023, 5, 4, 17, 10, 11),
      dt.datetime(2023, 5, 5, 17, 11, 12), dt.datetime(2023, 5, 6, 17, 12, 13),
      dt.datetime(2023, 5, 7, 17, 13, 14), dt.datetime(2023, 5, 8, 21, 14, 15),
      dt.datetime(2023, 5, 9, 21, 15, 16), dt.datetime(2023, 5, 10, 20, 16, 17),
      dt.datetime(2023, 5, 11, 21, 17, 18), dt.datetime(2023, 5, 13, 1, 18, 19)]),
    # TIME / TIMETZ: string keys carrying the pinned CAST(id AS TEXT) forms
    ("time", "string",
     ["08:09:10", "09:10:11", "10:11:12", "11:12:13", "12:13:14",
      "13:14:15", "14:15:16", "15:16:17", "16:17:18", "17:18:19"]),
    ("timetz", "string",
     ["08:09:10-05", "09:10:11-08", "10:11:12-07", "11:12:13-06",
      "12:13:14-05", "13:14:15-08", "14:15:16-07", "15:16:17-06",
      "16:17:18-05", "17:18:19-08"]),
    # INET: canonical text form (the /32 is the reference's *display*
    # of a host address; py_canon_inet canonicalizes to the bare form)
    ("inet", "string",
     ["23.100.234.255", "13.248.169.48", "152.19.134.142",
      "63.141.128.16", "23.21.162.66", "185.125.190.21",
      "20.112.250.133", "185.230.63.107", "217.196.149.50",
      "192.168.0.0"]),
]


@pytest.mark.parametrize("label,ddl,keys", MATRIX,
                         ids=[m[0] for m in MATRIX])
def test_key_type_scores(spark, label, ddl, keys):
    docs = spark.createDataFrame(list(zip(keys, VALUES)),
                                 f"id {ddl}, value string")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="value", **_NGRAM)]))
    got = compile_query(idx, ast.Term("value", "blue")) \
        .orderBy("score", ascending=False).collect()
    want_keys = [keys[i - 1] for i in (3, 2, 1, 9, 5, 4)]
    if label == "f32":  # float4 keys round-trip through float32 storage
        want_keys = [pytest.approx(k, rel=1e-6) for k in want_keys]
    assert [r["doc_id"] for r in got] == want_keys
    for r, (i, want) in zip(got, sorted(BLUE_SCORES.items(),
                                        key=lambda kv: -kv[1])):
        assert r["score"] == pytest.approx(want, abs=2e-6), (label, i)


def test_boolean_key(spark):
    """key.rs boolean_key: a 2-row corpus keyed by the boolean itself."""
    docs = spark.createDataFrame([(True, "bluetooth"), (False, "blue")],
                                 "id boolean, value string")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="value", **_NGRAM)]))
    got = compile_query(idx, ast.Term("value", "blue")) \
        .orderBy("score", ascending=False).collect()
    assert [(r["doc_id"], pytest.approx(r["score"], abs=2e-6))
            for r in got] == [(False, 0.25759196), (True, 0.14109309)]
