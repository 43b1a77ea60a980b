"""Three configuration/guardrail goldens (PUBLIC reference behavior,
tables replicated inline):

- index_config_errors.out: meaningful errors for a text_fields entry
  naming a nonexistent column, an unknown tokenizer type, an attempt
  to override the key field's BM25 config, and a missing key_field —
  reference error strings.
- aggregate_truncation_guard.out: a GROUP BY whose group count exceeds
  the bucket cap ERRORS instead of silently folding dropped groups;
  the same grouping bounded by ORDER BY key + LIMIT within the cap is
  answered exactly (ordered prefix); raising the cap returns all
  groups.
- keyword_defaults_fast.out: keyword-tokenized fields and UUID columns
  default to fast + raw normalizer in paradedb.schema().

Ref: pg_search/tests/pg_regress/expected/{index_config_errors,
aggregate_truncation_guard,keyword_defaults_fast}.out
"""

import pytest

import sparksearch.config as cfg
from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.aggs import AggBucketLimitError, search_aggregate
from sparksearch.api import schema as pdb_schema
from sparksearch.query import ast


# --- index_config_errors.out ------------------------------------------

@pytest.fixture(scope="module")
def cfg_docs(spark):
    return spark.createDataFrame([(1, "alpha")], "id long, name string")


def test_nonexistent_column_errors(cfg_docs):
    with pytest.raises(ValueError, match=r"the column `some_wrong_key` "
                                         r"does not exist in the USING "
                                         r"clause"):
        build_index(cfg_docs, IndexSchema(
            key_field="id",
            text_fields=[FieldConfig(name="some_wrong_key")]))


def test_unknown_tokenizer_errors(cfg_docs):
    with pytest.raises(ValueError,
                       match=r"field config should be valid for "
                             r"SearchFieldConfig::name: unknown tokenizer "
                             r"type: some_wrong_type"):
        build_index(cfg_docs, IndexSchema(
            key_field="id",
            text_fields=[FieldConfig(name="name",
                                     tokenizer="some_wrong_type")]))


def test_key_field_override_errors(cfg_docs):
    # a NUMERIC key cannot take a text tokenizer config
    with pytest.raises(ValueError,
                       match=r"cannot override BM25 configuration for "
                             r"key_field 'id'"):
        build_index(cfg_docs, IndexSchema(
            key_field="id",
            text_fields=[FieldConfig(name="id"),
                         FieldConfig(name="name")]))


def test_missing_key_field_errors(cfg_docs):
    with pytest.raises(ValueError,
                       match=r"index should have a `WITH "
                             r"\(key_field='\.\.\.'\)` option"):
        build_index(cfg_docs, IndexSchema(
            key_field="", text_fields=[FieldConfig(name="name")]))


def test_text_key_keyword_config_allowed(spark):
    # the one allowed key override: a TEXT key under the keyword-family
    # tokenizer — the AM's own forced key config
    docs = spark.createDataFrame([("k1", "alpha")],
                                 "id string, name string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="id", tokenizer="keyword",
                                 lowercase=False),
                     FieldConfig(name="name")]))
    assert idx.docs.count() == 1


# --- aggregate_truncation_guard.out ------------------------------------

@pytest.fixture(scope="module")
def trunc_index(spark):
    rows = [(g, f"seed_{g % 2}") for g in range(1, 101)]
    rows += [(g, f"cat_{g}") for g in range(1000, 1200)]
    docs = spark.createDataFrame(rows, "id long, cat string")
    return build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="cat", tokenizer="keyword",
                                 lowercase=False)]))


def test_unbounded_groupby_over_cap_errors(trunc_index):
    old = cfg.get().max_agg_buckets
    cfg.set(max_agg_buckets=10)
    try:
        with pytest.raises(AggBucketLimitError, match="max_agg_buckets"):
            search_aggregate(trunc_index, ast.All(), {
                "g": {"terms": {"field": "cat", "size": 65000}}})
    finally:
        cfg.set(max_agg_buckets=old)


def test_ordered_prefix_within_cap_ok(trunc_index):
    # GROUP BY cat ORDER BY cat LIMIT 5 under cap 10: the 5 smallest
    # keys, answered exactly — no error
    old = cfg.get().max_agg_buckets
    cfg.set(max_agg_buckets=10)
    try:
        res = search_aggregate(trunc_index, ast.All(), {
            "g": {"terms": {"field": "cat", "size": 5,
                            "order": {"_key": "asc"}}}})
        got = [(b["key"], b["doc_count"])
               for b in res["aggregations"]["g"]["buckets"]]
        assert got == [("cat_1000", 1), ("cat_1001", 1), ("cat_1002", 1),
                       ("cat_1003", 1), ("cat_1004", 1)]
    finally:
        cfg.set(max_agg_buckets=old)


def test_raised_cap_returns_all_groups(trunc_index):
    res = search_aggregate(trunc_index, ast.All(), {
        "g": {"terms": {"field": "cat", "size": 65000}}})
    assert len(res["aggregations"]["g"]["buckets"]) == 202


# --- keyword_defaults_fast.out -----------------------------------------

def test_keyword_and_uuid_default_fast(spark):
    docs = spark.createDataFrame(
        [(i, "banana", f"123e4567-e89b-12d3-a456-42661417400{i}")
         for i in range(5)],
        "id long, description string, org_id string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description", tokenizer="keyword",
                                 lowercase=False),
                     FieldConfig(name="org_id", field_type="uuid")]))
    rows = {r["name"]: r for r in pdb_schema(idx)}
    for col in ("description", "org_id"):
        assert rows[col]["field_type"] == "Str"
        assert rows[col]["fast"] is True
        assert rows[col]["tokenizer"] == "keyword[lowercase=false]"
        assert rows[col]["normalizer"] == "raw"
    assert rows["id"]["field_type"] == "I64"
    assert rows["id"]["fast"] is True
