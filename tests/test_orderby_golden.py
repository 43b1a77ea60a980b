"""ORDER BY golden family, ported from the reference pg_regress
index_order_by.out (PUBLIC reference behavior, tables replicated inline).

Covers the result-row matrix: NULLS placement under the reference's
Postgres defaults and explicit overrides, duplicate sort values, all-NULL
sort columns, empty/single-row results, column projection where the sort
key is NOT selected, and LIMIT/OFFSET over the sorted scan.  (The
reference file's EXPLAIN sections assert Postgres plan shapes — Sort vs
sorted-scan pathkeys — which have no Spark analog; the row-level
semantics they guard are what these tests pin.)
"""

import pytest

from sparksearch import IndexSchema, FieldConfig, build_index
from sparksearch.query import ast
from sparksearch.query.search import search


@pytest.fixture(scope="module")
def sorted_scan_index(spark):
    """index_order_by.out's sorted_scan_test: 5 base + 3×8 batch rows,
    sort_by='priority DESC NULLS LAST', plus section 6's 20 'document'
    rows (priority 1000-i)."""
    rows = [(1, "searchable product alpha", "electronics", 100, 4.5),
            (2, "searchable product beta", "electronics", 50, 3.8),
            (3, "searchable product gamma", "clothing", 150, 4.9),
            (4, "searchable product delta", "clothing", 75, 4.2),
            (5, "searchable product epsilon", "electronics", 200, 4.7)]
    nid = 6
    for b in (1, 2, 3):
        for i in range(1, 9):
            rows.append((nid, f"searchable batch{b} item {i}", f"batch{b}",
                         b * 10 + i, b + 1.0 + i * 0.1))
            nid += 1
    for i in range(1, 21):
        rows.append((nid, f"searchable document {i}", "docs",
                     1000 - i, 5.0 - i * 0.1))
        nid += 1
    docs = spark.createDataFrame(
        rows, "id int, content string, category string, priority int, "
              "score double")
    return build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="content")],
        sort_by="priority DESC NULLS LAST"))


@pytest.fixture(scope="module")
def asc_sort_index(spark):
    """asc_sort_test: 6 rows, two NULL values,
    sort_by='value ASC NULLS FIRST'."""
    rows = [(1, "item one", 50), (2, "item two", 20),
            (3, "item three", None), (4, "item four", 80),
            (5, "item five", None), (6, "item six", 10)]
    docs = spark.createDataFrame(rows, "id int, description string, value int")
    return build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="description")],
        sort_by="value ASC NULLS FIRST"))


def _ids(idx, q, **kw):
    return [r["id"] for r in search(idx, q, with_score=False, **kw).collect()]


def test_nulls_first_asc_golden(asc_sort_index):
    """Test 2.3: ORDER BY value ASC NULLS FIRST → 3,5 (NULLs, id-tiebreak)
    then 6,2,1,4."""
    got = search(asc_sort_index, ast.Parse("item", field="description"),
                 order_by=[("value", "asc nulls first"), ("id", "asc")],
                 columns=["id", "value"], with_score=False).collect()
    assert [(r["id"], r["value"]) for r in got] == [
        (3, None), (5, None), (6, 10), (2, 20), (1, 50), (4, 80)]


def test_asc_default_nulls_last_golden(asc_sort_index):
    """Test 2.2's semantic: plain ASC uses the reference's Postgres
    default NULLS LAST → values first, NULLs (3,5) at the end."""
    got = search(asc_sort_index, ast.Parse("item", field="description"),
                 order_by=[("value", "asc"), ("id", "asc")],
                 columns=["id", "value"], with_score=False).collect()
    assert [(r["id"], r["value"]) for r in got] == [
        (6, 10), (2, 20), (1, 50), (4, 80), (3, None), (5, None)]


def test_projection_excludes_sort_key_golden(sorted_scan_index):
    """Tests 3.2/3.3: ORDER BY priority while selecting only content/id —
    epsilon(200), gamma(150), alpha(100), delta(75), beta(50), then
    batch3 8..1, batch2 8..1, batch1 8..1 → ids 5,3,1,4,2,29..6."""
    q = ast.Parse("searchable", field="content")
    got = search(sorted_scan_index, q,
                 order_by=[("priority", "desc nulls last"), ("id", "asc")],
                 columns=["content"], with_score=False).collect()
    want_head = ["searchable product epsilon", "searchable product gamma",
                 "searchable product alpha", "searchable product delta",
                 "searchable product beta"]
    # section-6 'document' rows also contain 'searchable'; the reference
    # ran 3.2 BEFORE inserting them, so filter to the original 29
    texts = [r["content"] for r in got
             if "document" not in r["content"]]
    assert texts[:5] == want_head
    assert texts[5:] == [f"searchable batch{b} item {i}"
                         for b in (3, 2, 1) for i in range(8, 0, -1)]
    ids = [i for i in _ids(sorted_scan_index, q,
                           order_by=[("priority", "desc nulls last"),
                                     ("id", "asc")], columns=["id"])
           if i <= 29]
    assert ids == [5, 3, 1, 4, 2] + list(range(29, 5, -1))


def test_duplicate_sort_values_golden(spark):
    """Test 5.2: duplicates keep deterministic key order within ties:
    value DESC → 3,5 (100) then 1,2,4 (50)."""
    rows = [(1, "doc alpha", 50), (2, "doc beta", 50), (3, "doc gamma", 100),
            (4, "doc delta", 50), (5, "doc epsilon", 100)]
    docs = spark.createDataFrame(rows, "id int, content string, value int")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="content")],
        sort_by="value DESC NULLS LAST"))
    got = search(idx, ast.Parse("doc", field="content"),
                 order_by=[("value", "desc nulls last"), ("id", "asc")],
                 columns=["id", "value"], with_score=False).collect()
    assert [(r["id"], r["value"]) for r in got] == [
        (3, 100), (5, 100), (1, 50), (2, 50), (4, 50)]


def test_all_null_sort_column_golden(spark):
    """Test 5.3: all-NULL sort column → key order, no crash."""
    rows = [(1, "item one", None), (2, "item two", None),
            (3, "item three", None)]
    docs = spark.createDataFrame(rows, "id int, content string, value int")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="content")],
        sort_by="value DESC NULLS LAST"))
    got = search(idx, ast.Parse("item", field="content"),
                 order_by=[("value", "desc nulls last"), ("id", "asc")],
                 columns=["id"], with_score=False).collect()
    assert [r["id"] for r in got] == [1, 2, 3]


def test_empty_and_single_row_golden(spark):
    """Tests 5.1/5.4: empty result set and single-row result."""
    docs = spark.createDataFrame([(1, "unique", 42), (2, "other", 99)],
                                 "id int, content string, value int")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="content")],
        sort_by="value DESC NULLS LAST"))
    assert search(idx, ast.Parse("nonexistent", field="content"),
                  columns=["id"], with_score=False).count() == 0
    got = search(idx, ast.Parse("unique", field="content"),
                 order_by=[("value", "desc nulls last")],
                 columns=["id", "value"], with_score=False).collect()
    assert [(r["id"], r["value"]) for r in got] == [(1, 42)]


def test_limit_offset_golden(sorted_scan_index):
    """Tests 6.1-6.4 over the 'document' rows (ids 30-49, priority
    999..980): LIMIT 5 → 30-34; LIMIT 5 OFFSET 5 → 35-39; LIMIT 3 →
    30-32; LIMIT 100 → all 20."""
    q = ast.Parse("document", field="content")
    ob = [("priority", "desc nulls last"), ("id", "asc")]
    assert _ids(sorted_scan_index, q, order_by=ob, columns=["id"],
                limit=5) == [30, 31, 32, 33, 34]
    assert _ids(sorted_scan_index, q, order_by=ob, columns=["id"],
                limit=5, offset=5) == [35, 36, 37, 38, 39]
    assert _ids(sorted_scan_index, q, order_by=ob, columns=["id"],
                limit=3) == [30, 31, 32]
    assert _ids(sorted_scan_index, q, order_by=ob, columns=["id"],
                limit=100) == list(range(30, 50))


@pytest.mark.parametrize("case", ["float", "timestamp", "date", "uuid",
                                  "numeric"])
def test_datatype_sort_golden(spark, case):
    """index_order_by.out Section 4: sorting works across fast-field data
    types — FLOAT, TIMESTAMP, DATE, UUID (string byte-order), and
    wide NUMERIC(30,0) (NumericBytes order-preserving encoding; Spark
    decimal(30,0) compares numerically) — with the reference's NULLS
    placement."""
    if case == "float":
        rows = [(1, "movie a", 8.5), (2, "movie b", 7.2), (3, "movie c", 9.1),
                (4, "movie d", 6.8), (5, "movie e", 8.9)]
        schema, col, direction = "id int, content string, v double", "v", \
            "desc nulls last"
        want = [3, 5, 1, 2, 4]
        term = "movie"
    elif case == "timestamp":
        import datetime as dt
        rows = [(1, "event a", dt.datetime(2024, 1, 15, 10)),
                (2, "event b", dt.datetime(2024, 3, 20, 14, 30)),
                (3, "event c", dt.datetime(2024, 1, 1, 8)),
                (4, "event d", dt.datetime(2024, 6, 10, 16, 45)),
                (5, "event e", dt.datetime(2024, 2, 28, 12))]
        schema, col, direction = "id int, content string, v timestamp", "v", \
            "desc nulls last"
        want = [4, 2, 5, 1, 3]
        term = "event"
    elif case == "date":
        import datetime as dt
        rows = [(1, "appointment a", dt.date(2024, 5, 15)),
                (2, "appointment b", dt.date(2024, 3, 1)),
                (3, "appointment c", dt.date(2024, 7, 20)),
                (4, "appointment d", dt.date(2024, 1, 10)),
                (5, "appointment e", dt.date(2024, 4, 25))]
        schema, col, direction = "id int, content string, v date", "v", \
            "asc nulls first"
        want = [4, 2, 5, 1, 3]
        term = "appointment"
    elif case == "uuid":
        rows = [(1, "uuid", "00000000-0000-0000-0000-000000000002"),
                (2, "uuid", "00000000-0000-0000-0000-000000000010"),
                (3, "uuid", "00000000-0000-0000-0000-000000000001"),
                (4, "uuid", None),
                (5, "uuid", "00000000-0000-0000-0000-000000000003"),
                (6, "uuid", "00000000-0000-0000-0000-000000000100")]
        schema, col, direction = "id int, content string, v string", "v", \
            "asc nulls first"
        want = [4, 3, 1, 5, 2, 6]
        term = "uuid"
    else:  # numeric(30,0) — beyond long range
        from decimal import Decimal
        rows = [(1, "num", None),
                (2, "num", Decimal(10**29)),
                (3, "num", Decimal(5)), (4, "num", Decimal(10)),
                (5, "num", Decimal(1)), (6, "num", Decimal(10**29 + 1)),
                (7, "num", Decimal(500)), (8, "num", Decimal(50))]
        schema, col, direction = "id int, content string, v decimal(30,0)", \
            "v", "asc nulls first"
        want = [1, 5, 3, 4, 8, 7, 2, 6]
        term = "num"
    docs = spark.createDataFrame(rows, schema)
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="content")],
        sort_by=f"{col} {direction.upper()}"))
    got = [r["id"] for r in search(
        idx, ast.Parse(term, field="content"),
        order_by=[(col, direction), ("id", "asc")],
        columns=["id", col], with_score=False).collect()]
    assert got == want


def test_byte_ordered_text_sort_golden(spark):
    """order_by_collation.out result semantics: the engine sorts text in
    byte (C-collation) order — the only ordering the reference pushes
    into the index (TopK refuses non-byte-ordered collations), so
    uppercase letters sort before lowercase: Banana, Date, apple,
    cherry, elderberry."""
    rows = [(1, "apple", 10), (2, "Banana", 20), (3, "cherry", 30),
            (4, "Date", 40), (5, "elderberry", 50)]
    docs = spark.createDataFrame(rows, "id int, name_c string, priority int")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="name_c")]))
    got = [r["name_c"] for r in search(
        idx, ast.All(), order_by=[("name_c", "asc")], limit=5,
        columns=["name_c"], with_score=False).collect()]
    assert got == ["Banana", "Date", "apple", "cherry", "elderberry"]


def test_string_key_topk_order_golden(spark):
    """string_id_limit.out: keyword-field term search with ORDER BY a
    VARCHAR key DESC LIMIT — the TopK must return the byte-order top
    keys, not insertion order."""
    rows = [("ctx_01ifsur2egUPnbJOAiHv", "customer_1"),
            ("ctx_01iddo3tioqV6f4yCB6O", "customer_1"),
            ("ctx_01ic75tgb5J5XkhJqkjn", "customer_1"),
            ("ctx_01iso5q4prkOQVGKK0ue", "customer_1")]
    docs = spark.createDataFrame(rows, "id string, customer_id string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="customer_id", tokenizer="keyword")]))
    got = [r["id"] for r in search(
        idx, ast.Term("customer_id", "customer_1"),
        order_by=[("id", "desc")], limit=2, columns=["id"],
        with_score=False).collect()]
    assert got == ["ctx_01iso5q4prkOQVGKK0ue", "ctx_01ifsur2egUPnbJOAiHv"]
    # without limit: full set, still key-desc
    allr = [r["id"] for r in search(
        idx, ast.Term("customer_id", "customer_1"),
        order_by=[("id", "desc")], columns=["id"],
        with_score=False).collect()]
    assert allr == sorted((r[0] for r in rows), reverse=True)


def test_join_order_by_limit_golden(spark):
    """join_order_by.out Test 1: search-filtered join ordered by the
    left key with LIMIT — t2.t1_id = (i % 1000) + 1, so t1.id=1 joins
    t2.id=1000, t1.id=k joins t2.id=k-1 for k>=2."""
    t1 = spark.createDataFrame([(i, f"val {i}") for i in range(1, 1001)],
                               "id int, val string")
    t2 = spark.createDataFrame(
        [(i, (i % 1000) + 1, f"val {i}") for i in range(1, 1001)],
        "id int, t1_id int, val string")
    idx = build_index(t1, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="val")],
        sort_by="id ASC NULLS FIRST"))
    from pyspark.sql import functions as F
    matches = search(idx, ast.Parse("val", field="val"),
                     order_by=[("id", "asc nulls first")], limit=10,
                     columns=["id", "val"], with_score=False)
    joined = (matches.join(t2.select(F.col("t1_id"),
                                     F.col("val").alias("val2")),
                           matches["id"] == F.col("t1_id"))
              .orderBy("id").limit(10))
    got = [(r["val"], r["val2"]) for r in joined.collect()]
    assert got[0] == ("val 1", "val 1000")
    assert got[1:] == [(f"val {k}", f"val {k - 1}") for k in range(2, 11)]
