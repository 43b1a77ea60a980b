"""groupby_filter_mixed_buckets.out parity — overlapping FILTER counts.

Oracle: /root/reference/pg_search/tests/pg_regress/expected/
groupby_filter_mixed_buckets.out.  One query computes 12 independent
``COUNT(*) FILTER (WHERE ...)`` values mixing text-search predicates
(``category @@@ 'electronics'``, ``brand @@@ 'Apple'`` — the needle
analyzed by the field tokenizer, so 'Apple' hits the lowercased token),
numeric comparisons (``rating >= 4``) and boolean equality.  The pinned
counts overlap heavily (the four category filters alone cover all 20
rows, which the two status filters cover again) — filters buckets are
NOT mutually exclusive.
"""

import pytest

from sparksearch import IndexSchema, FieldConfig, build_index
from sparksearch.aggs import search_aggregate
from sparksearch.query import ast

ROWS = [
    (1, "MacBook Pro", "laptop computer with keyboard", "electronics", "Apple", "available", 2499.99, 5, True, 1500),
    (2, "iMac Desktop", "desktop computer with monitor", "electronics", "Apple", "available", 1999.99, 5, True, 1200),
    (3, "iPad Tablet", "tablet with stylus", "electronics", "Apple", "sold", 899.99, 4, False, 2000),
    (4, "Galaxy Laptop", "laptop computer gaming", "electronics", "Samsung", "available", 1799.99, 4, True, 800),
    (5, "Samsung Monitor", "monitor ultra wide", "electronics", "Samsung", "available", 599.99, 4, True, 600),
    (6, "Galaxy Tablet", "tablet android device", "electronics", "Samsung", "sold", 649.99, 3, False, 900),
    (7, "Gaming Keyboard", "keyboard mechanical gaming", "electronics", "Generic", "available", 149.99, 3, True, 400),
    (8, "Wireless Mouse", "mouse wireless pro", "electronics", "Generic", "available", 79.99, 4, True, 300),
    (9, "Developer T-Shirt", "shirt for programming", "clothing", "TechWear", "available", 24.99, 4, True, 200),
    (10, "Database Hoodie", "hoodie with logo", "clothing", "TechWear", "available", 59.99, 5, True, 350),
    (11, "Running Shoes", "shoes for running", "clothing", "SportsBrand", "sold", 129.99, 4, False, 180),
    (12, "Casual Jeans", "jeans casual wear", "clothing", "FashionCo", "available", 79.99, 3, True, 120),
    (13, "Database Systems", "database design book", "books", "TechPress", "available", 49.99, 5, True, 1800),
    (14, "Search Engines", "search engine design", "books", "TechPress", "available", 59.99, 5, True, 1600),
    (15, "SQL Performance", "sql optimization guide", "books", "DataBooks", "sold", 39.99, 4, False, 1400),
    (16, "PostgreSQL Guide", "postgresql advanced topics", "books", "DataBooks", "available", 44.99, 4, True, 1200),
    (17, "Tennis Racket", "racket for tennis", "sports", "SportsCorp", "available", 199.99, 4, True, 250),
    (18, "Basketball", "basketball official size", "sports", "SportsCorp", "available", 29.99, 3, True, 150),
    (19, "Soccer Ball", "soccer ball professional", "sports", "PlayTime", "sold", 39.99, 4, False, 200),
    (20, "Golf Clubs", "golf club set premium", "sports", "GolfPro", "available", 899.99, 5, True, 100),
]

SCHEMA = ("id int, title string, description string, category string, "
          "brand string, status string, price double, rating int, "
          "in_stock boolean, views int")

# golden's single result row
EXPECTED = {"f1": 8, "f2": 4, "f3": 4, "f4": 4, "f5": 3, "f6": 3, "f7": 2,
            "f8": 15, "f9": 5, "f10": 16, "f11": 6, "f12": 15}


@pytest.fixture(scope="module")
def filter_agg_index(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    schema = IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="title"),
                     FieldConfig(name="description"),
                     FieldConfig(name="category"),
                     FieldConfig(name="brand"),
                     FieldConfig(name="status")])
    return build_index(df, schema)


def test_mixed_filter_counts(filter_agg_index):
    res = search_aggregate(filter_agg_index, ast.All(), {
        "mixed": {"filters": {"filters": {
            "f1": {"match": {"category": "electronics"}},
            "f2": {"match": {"category": "clothing"}},
            "f3": {"match": {"category": "books"}},
            "f4": {"match": {"category": "sports"}},
            "f5": {"match": {"brand": "Apple"}},
            "f6": {"match": {"brand": "Samsung"}},
            "f7": {"match": {"brand": "TechPress"}},
            "f8": {"match": {"status": "available"}},
            "f9": {"match": {"status": "sold"}},
            "f10": {"range": {"rating": {"gte": 4}}},
            "f11": {"range": {"rating": {"gte": 5}}},
            "f12": {"term": {"in_stock": True}},
        }}}})
    got = {b["key"]: b["doc_count"]
           for b in res["aggregations"]["mixed"]["buckets"]}
    assert got == EXPECTED


def test_overlap_is_counted_everywhere(filter_agg_index):
    # a doc matching several filters appears in each bucket: the four
    # category buckets tile all 20 docs, the two status buckets retile
    # the same 20 — total membership far exceeds the row count
    res = search_aggregate(filter_agg_index, ast.All(), {
        "m": {"filters": {"filters": {
            "cat_elec": {"match": {"category": "electronics"}},
            "avail": {"match": {"status": "available"}},
            "all": {"match_all": {}},
        }}}})
    got = {b["key"]: b["doc_count"]
           for b in res["aggregations"]["m"]["buckets"]}
    assert got == {"cat_elec": 8, "avail": 15, "all": 20}
    assert sum(got.values()) > 20


def test_match_filter_analyzes_needle(filter_agg_index):
    # 'Apple' analyzed through the brand field's default tokenizer
    # lowercases to the indexed token; raw-case term filter on the DOC
    # column is the unanalyzed alternative, pinning they differ
    res = search_aggregate(filter_agg_index, ast.All(), {
        "m": {"filters": {"filters": {
            "match_upper": {"match": {"brand": "Apple"}},
            "term_lower_raw": {"term": {"brand": "apple"}},
        }}}})
    got = {b["key"]: b["doc_count"]
           for b in res["aggregations"]["m"]["buckets"]}
    assert got.get("match_upper") == 3
    # raw doc value is 'Apple', so the unanalyzed term needle matches
    # nothing — and a no-match NAMED filter still yields its bucket with
    # doc_count 0, like COUNT(*) FILTER (WHERE ...) returning 0
    assert got.get("term_lower_raw") == 0
