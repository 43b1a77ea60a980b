"""complex_query_series_view.out golden (PUBLIC reference behavior) +
the JSON query wire format (``col @@@ '<json>'::jsonb``).

The reference accepts a serialized SearchQueryInput anywhere a query
string is legal; complex_query_series_view.out drives a nested
boolean (must: numeric term + availability term; should: two condition
terms) through the ``::jsonb`` cast, ORDER BY pdb.score DESC LIMIT 12
OFFSET 0.  The reference populates its table with PG ``random()``
after ``setseed(0.42)`` — a PRNG sequence that is not reproducible
outside Postgres — so this port keeps the exact query JSON and result
semantics over a deterministic corpus, and verifies the page against
an independently-computed BM25 oracle (every field is single-token, so
each matching doc's score is exactly Σ idf(term) and the page order is
decided by the rarer matched should-term, then key order).

Also unit-covers :func:`sparksearch.query.from_json` on wire shapes
lifted verbatim from the reference's EXPLAIN plans (match with null
options, excluded range bounds, heap_filter + with_index nesting).

Ref: pg_search/tests/pg_regress/expected/complex_query_series_view.out
     pg_search/src/query/mod.rs:63-170 (SearchQueryInput serde)
     pg_search/src/query/pdb_query.rs:149-327 (pdb::Query serde)
"""

import math

import numpy as np
import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast, from_json
from sparksearch.query.search import search

N = 10000


def _rows():
    out = []
    for i in range(1, N + 1):
        out.append((
            i,
            115 if i % 9 == 0 else (i * 7) % 100,
            "new" if i % 2 == 0 else (
                "refurbished" if i % 10 == 9 else "used"),
            "available" if i % 7 != 0 else "out_of_stock",
            float((i * 13) % 100),
            (i * 101) % 100000,
            i % 2 == 0,
            (i % 5) + 1,
        ))
    return out


# the exact query JSON from complex_query_series_view.out
QUERY_JSON = ('{"boolean":{"must":[{"term":{"field":"supplier_id",'
              '"value":115}},{"boolean":{"should":[{"term":{"field":'
              '"condition","value":"new"}},{"term":{"field":"condition",'
              '"value":"used"}}]}},{"term":{"field":"availability",'
              '"value":"available"}}]}}')


@pytest.fixture(scope="module")
def inv(spark):
    docs = spark.createDataFrame(
        _rows(),
        "id int, supplier_id int, condition string, availability string, "
        "customer_rating double, sales_rank int, is_certified boolean, "
        "location_count int")
    return build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="condition"),
                     FieldConfig(name="availability")],
        numeric_fields=["supplier_id"]))


def _idf(df_count: int) -> float:
    return math.log(1.0 + (N - df_count + 0.5) / (df_count + 0.5))


def test_jsonb_boolean_score_page(inv):
    """The golden's score-ordered LIMIT 12 OFFSET 0 page, against an
    independent Σ-idf oracle over the deterministic corpus."""
    rows = _rows()
    df_new = sum(1 for r in rows if r[2] == "new")
    df_used = sum(1 for r in rows if r[2] == "used")
    scored = []
    for r in rows:
        if not (r[1] == 115 and r[2] in ("new", "used")
                and r[3] == "available"):
            continue
        cond_idf = _idf(df_new) if r[2] == "new" else _idf(df_used)
        scored.append((r[0], cond_idf))
    assert scored, "corpus must produce matches"
    exp = [i for i, _ in sorted(scored, key=lambda t: (-t[1], t[0]))][:12]

    got = search(inv, from_json(QUERY_JSON), limit=12, offset=0,
                 order_by=[("score", "desc"), ("id", "asc")],
                 columns=["id"]).collect()
    assert [r.id for r in got] == exp
    # the score really is Σ idf: every field is single-token (dl=1 =
    # avgdl → tf-norm exactly 1), numeric terms score fieldnorm-1 idf
    sup_df = sum(1 for r in rows if r[1] == 115)
    av_df = sum(1 for r in rows if r[3] == "available")
    top = _idf(sup_df) + _idf(av_df) + max(_idf(df_new), _idf(df_used))
    assert np.float32(got[0].score) == pytest.approx(np.float32(top),
                                                     rel=1e-5)


def test_dict_query_accepted_directly(inv):
    """search() takes the parsed-JSON dict itself, like the ::jsonb
    operand."""
    import json
    got = search(inv, json.loads(QUERY_JSON), limit=3,
                 columns=["id"]).collect()
    assert len(got) == 3


# --- wire-format unit matrix (shapes lifted from reference plans) ------------

def test_from_json_match_with_null_options():
    # issue_5108.out plan line
    q = from_json('{"with_index":{"query":{"match":{"field":"body",'
                  '"value":"healthcare","tokenizer":null,"distance":null,'
                  '"transposition_cost_one":null,"prefix":null,'
                  '"conjunction_mode":null}}}}')
    assert q == ast.Match("body", "healthcare")


def test_from_json_excluded_range_bound():
    # issue_4146.out plan line
    q = from_json('{"range":{"field":"sizeInBytes","lower_bound":'
                  '{"excluded":5000},"upper_bound":null}}')
    assert q == ast.Range("sizeInBytes", lower=5000, upper=None,
                          lower_inclusive=False, upper_inclusive=True)


def test_from_json_heap_filter_nesting():
    # issue_4146.out: heap LIKE filter composed with an indexed all()
    q = from_json(
        '{"boolean":{"must":[{"heap_filter":{"indexed_query":"all",'
        '"field_filters":[{"heap_filter":'
        '"(parents ~~ \'SFR%\'::text)"}]}},'
        '{"with_index":{"query":{"all":{"field":"id"}}}}]}}')
    assert isinstance(q, ast.Boolean) and len(q.must) == 2
    hf, al = q.must
    assert isinstance(hf, ast.HeapFilter) and isinstance(hf.query, ast.All)
    assert hf.predicate == "(parents ~~ 'SFR%'::text)"
    assert isinstance(al, ast.All)


def test_from_json_parse_with_field():
    q = from_json('{"parse_with_field":{"field":"title","query_string":'
                  '"product","lenient":null,"conjunction_mode":null}}')
    assert q == ast.Parse("product", field="title")


def test_from_json_fielded_units_and_leaves():
    assert from_json("all") == ast.All()
    assert from_json('{"exists":{"field":"meta"}}') == ast.Exists("meta")
    assert from_json('{"term_set":{"field":"c","terms":["a","b"]}}') \
        == ast.TermSet("c", ["a", "b"])
    assert from_json('{"term_set":{"terms":[{"field":"c","value":"a"},'
                     '{"field":"c","value":"b"}]}}') \
        == ast.TermSet("c", ["a", "b"])
    assert from_json('{"fuzzy_term":{"field":"n","value":"keybord",'
                     '"distance":1,"transposition_cost_one":null,'
                     '"prefix":null}}') \
        == ast.Fuzzy("n", "keybord", distance=1)
    assert from_json('{"phrase":{"field":"b","phrases":["x","y"],'
                     '"slop":2}}') == ast.Phrase("b", ["x", "y"], slop=2)
    assert from_json('{"boost":{"query":{"term":{"field":"c","value":1}},'
                     '"factor":2.0}}') \
        == ast.Boost(ast.Term("c", 1), factor=2.0)


def test_from_json_unknown_variant_raises():
    with pytest.raises(ValueError, match="unsupported query input"):
        from_json('{"frobnicate":{"field":"x"}}')
