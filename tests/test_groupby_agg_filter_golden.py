"""groupby-agg-filter.out golden (PUBLIC reference behavior): aggregates
with ``FILTER (WHERE col @@@ 'query')`` — conditional aggregation where
the filter condition is an INDEXED SEARCH match.  Spark-first recipe:
each search filter becomes a match-flag column (left-semi-derived
boolean from compile_query), and the aggregates run in ONE pass with
``F.count/sum/avg(F.when(flag, ...))`` — the same single-scan
multi-query shape the reference's AggregateScan builds."""

import pytest
from pyspark.sql import functions as F

from sparksearch import IndexSchema, FieldConfig, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

ROWS = [
    (1, "MacBook Pro", "laptop computer with keyboard", "electronics",
     "Apple", "available", 2499.99, 5, True, 1500),
    (2, "iMac Desktop", "desktop computer with monitor", "electronics",
     "Apple", "available", 1999.99, 5, True, 1200),
    (3, "iPad Tablet", "tablet with stylus", "electronics", "Apple",
     "sold", 899.99, 4, False, 2000),
    (4, "Galaxy Laptop", "laptop computer gaming", "electronics", "Samsung",
     "available", 1799.99, 4, True, 800),
    (5, "Samsung Monitor", "monitor ultra wide", "electronics", "Samsung",
     "available", 599.99, 4, True, 600),
    (6, "Galaxy Tablet", "tablet android device", "electronics", "Samsung",
     "sold", 649.99, 3, False, 900),
    (7, "Gaming Keyboard", "keyboard mechanical gaming", "electronics",
     "Generic", "available", 149.99, 3, True, 400),
    (8, "Wireless Mouse", "mouse wireless pro", "electronics", "Generic",
     "available", 79.99, 4, True, 300),
    (9, "Developer T-Shirt", "shirt for programming", "clothing",
     "TechWear", "available", 24.99, 4, True, 200),
    (10, "Database Hoodie", "hoodie with logo", "clothing", "TechWear",
     "available", 59.99, 5, True, 350),
    (11, "Running Shoes", "shoes for running", "clothing", "SportsBrand",
     "sold", 129.99, 4, False, 180),
    (12, "Casual Jeans", "jeans casual wear", "clothing", "FashionCo",
     "available", 79.99, 3, True, 120),
    (13, "Database Systems", "database design book", "books", "TechPress",
     "available", 49.99, 5, True, 1800),
    (14, "Search Engines", "search engine design", "books", "TechPress",
     "available", 59.99, 5, True, 1600),
    (15, "SQL Performance", "sql optimization guide", "books", "DataBooks",
     "sold", 39.99, 4, False, 1400),
    (16, "PostgreSQL Guide", "postgresql advanced topics", "books",
     "DataBooks", "available", 44.99, 4, True, 1200),
    (17, "Tennis Racket", "racket for tennis", "sports", "SportsCorp",
     "available", 199.99, 4, True, 250),
    (18, "Basketball", "basketball official size", "sports", "SportsCorp",
     "available", 29.99, 3, True, 150),
    (19, "Soccer Ball", "soccer ball professional", "sports", "PlayTime",
     "sold", 39.99, 4, False, 200),
    (20, "Golf Clubs", "golf club set premium", "sports", "GolfPro",
     "available", 899.99, 5, True, 100),
]

SCHEMA = ("id int, title string, description string, category string, "
          "brand string, status string, price double, rating int, "
          "in_stock boolean, views int")


@pytest.fixture(scope="module")
def fidx(spark):
    docs = spark.createDataFrame(ROWS, SCHEMA)
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="title"),
                     FieldConfig(name="description"),
                     FieldConfig(name="category"),
                     FieldConfig(name="brand"),
                     FieldConfig(name="status")]))
    return idx, docs


def _flagged(idx, docs, **queries):
    """docs + one boolean match-flag column per search filter, all
    derived from index scans — a single downstream aggregation pass."""
    out = docs
    for name, q in queries.items():
        m = (compile_query(idx, q).select("doc_id")
             .withColumn(name, F.lit(True)))
        out = out.join(m, out["id"] == m["doc_id"], "left") \
                 .drop("doc_id") \
                 .withColumn(name, F.coalesce(F.col(name), F.lit(False)))
    return out


def test_single_and_multi_filter_counts_golden(fidx):
    """Tests 1.1/1.2: COUNT(*) FILTER over one and several @@@ filters."""
    idx, docs = fidx
    d = _flagged(idx, docs,
                 laptop=ast.Term("description", "laptop"),
                 keyboard=ast.Term("description", "keyboard"),
                 books=ast.Term("category", "books"))
    r = d.agg(F.count("*").alias("total"),
              F.count(F.when(F.col("laptop"), 1)).alias("laptop_count"),
              F.count(F.when(F.col("keyboard"), 1)).alias("keyboard_count"),
              F.count(F.when(F.col("books"), 1)).alias("books_count")
              ).first()
    assert (r["total"], r["laptop_count"], r["keyboard_count"],
            r["books_count"]) == (20, 2, 2, 4)


def test_filter_with_base_where_golden(fidx):
    """Test 1.3: base WHERE status @@@ 'available' + per-agg filters."""
    idx, docs = fidx
    base = (compile_query(idx, ast.Term("status", "available"))
            .select("doc_id"))
    avail = docs.join(base, docs["id"] == base["doc_id"], "left_semi")
    d = _flagged(idx, avail,
                 electronics=ast.Term("category", "electronics"),
                 apple=ast.Term("brand", "apple"))
    r = d.agg(F.count("*").alias("t"),
              F.count(F.when(F.col("electronics"), 1)).alias("e"),
              F.count(F.when(F.col("apple"), 1)).alias("a")).first()
    assert (r["t"], r["e"], r["a"]) == (15, 6, 2)


def test_mixed_aggregate_types_with_filters_golden(fidx):
    """Test 1.4: SUM/AVG/MAX/MIN each under a different @@@ filter."""
    idx, docs = fidx
    d = _flagged(idx, docs,
                 electronics=ast.Term("category", "electronics"),
                 apple=ast.Term("brand", "apple"),
                 laptop=ast.Term("description", "laptop"),
                 sold=ast.Term("status", "sold"))
    r = d.agg(
        F.count("*").alias("total"),
        F.round(F.sum(F.when(F.col("electronics"), F.col("price"))), 2)
         .alias("electronics_revenue"),
        F.avg(F.when(F.col("apple"), F.col("rating")))
         .alias("apple_avg_rating"),
        F.max(F.when(F.col("laptop"), F.col("price")))
         .alias("max_laptop_price"),
        F.min(F.when(F.col("sold"), F.col("views"))).alias("min_sold_views"),
    ).first()
    assert r["total"] == 20
    assert r["electronics_revenue"] == pytest.approx(8679.92)
    assert r["apple_avg_rating"] == pytest.approx(4.66666666666667)
    assert r["max_laptop_price"] == pytest.approx(2499.99)
    assert r["min_sold_views"] == 180
