"""columnar_advanced_07_recursive_cte golden (PUBLIC reference behavior,
category hierarchy replicated inline): recursive CTEs walking a category
tree whose base/recursive cases carry search and fast-field predicates.
Spark has no RECURSIVE CTE; the port drives the same fixpoint as an
iterative frontier loop of (broadcast-able) self-joins — each iteration
joins the previous frontier to the child level, exactly PG's UNION ALL
working-table semantics (duplicate paths are KEPT, test 3).

Ref: pg_search/tests/pg_regress/expected/columnar_advanced_07_recursive_cte.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

# (id, name, parent_id, level, description, item_count, is_active)
CATEGORIES = [
    (1, "Electronics", None, 1, "Electronic devices and accessories", 250, True),
    (2, "Books", None, 1, "Books and literature", 500, True),
    (3, "Clothing", None, 1, "Apparel and fashion items", 300, True),
    (4, "Home & Garden", None, 1, "Home improvement and garden supplies", 180, True),
    (5, "Computers", 1, 2, "Desktop and laptop computers", 80, True),
    (6, "Smartphones", 1, 2, "Mobile phones and accessories", 120, True),
    (7, "Audio", 1, 2, "Speakers, headphones, and audio equipment", 50, True),
    (8, "Fiction", 2, 2, "Fiction books and novels", 200, True),
    (9, "Non-Fiction", 2, 2, "Non-fiction and reference books", 250, True),
    (10, "Academic", 2, 2, "Textbooks and academic materials", 50, True),
    (11, "Men", 3, 2, "Mens clothing", 100, True),
    (12, "Women", 3, 2, "Womens clothing", 150, True),
    (13, "Children", 3, 2, "Childrens clothing", 50, True),
    (14, "Furniture", 4, 2, "Home furniture", 80, True),
    (15, "Garden Tools", 4, 2, "Garden equipment and supplies", 60, True),
    (16, "Kitchen", 4, 2, "Kitchen appliances and utensils", 40, True),
    (17, "Laptops", 5, 3, "Portable computers", 40, True),
    (18, "Desktops", 5, 3, "Desktop computers", 30, True),
    (19, "Tablets", 5, 3, "Tablet computers", 10, True),
    (20, "Android", 6, 3, "Android smartphones", 60, True),
    (21, "iOS", 6, 3, "iPhones and iOS devices", 50, True),
    (22, "Other", 6, 3, "Other smartphone platforms", 10, True),
    (23, "Headphones", 7, 3, "Personal audio devices", 30, True),
    (24, "Speakers", 7, 3, "Speaker systems", 15, True),
    (25, "Receivers", 7, 3, "Audio receivers and amplifiers", 5, True),
]


@pytest.fixture(scope="module")
def category(spark):
    docs = spark.createDataFrame(
        CATEGORIES, "id int, name string, parent_id int, level int, "
        "description string, item_count int, is_active boolean")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="name"),
                                     FieldConfig(name="description")]))
    return docs, idx


def _recursive(base, docs, step_filter=None, max_depth=10):
    """PG WITH RECURSIVE ... UNION ALL: iterate the child join until the
    frontier empties, keeping every produced row (duplicates included)."""
    out, frontier = base, base
    for _ in range(max_depth):
        kids = docs.alias("c").join(
            frontier.select(F.col("id").alias("__pid")).alias("ct"),
            F.col("c.parent_id") == F.col("__pid"))
        if step_filter is not None:
            kids = kids.filter(step_filter)
        frontier = kids.select("c.*")
        if frontier.isEmpty():
            break
        out = out.unionAll(frontier)
    return out


def test_descendants_of_electronics(category):
    docs, _ = category
    tree = _recursive(docs.filter(F.col("name") == "Electronics"), docs)
    got = tree.select("name", "level", "item_count") \
        .orderBy("level", "name").collect()
    assert [tuple(r) for r in got] == [
        ("Electronics", 1, 250),
        ("Audio", 2, 50), ("Computers", 2, 80), ("Smartphones", 2, 120),
        ("Android", 3, 60), ("Desktops", 3, 30), ("Headphones", 3, 30),
        ("Laptops", 3, 40), ("Other", 3, 10), ("Receivers", 3, 5),
        ("Speakers", 3, 15), ("Tablets", 3, 10), ("iOS", 3, 50)]


def test_mixed_field_filtered_recursion(category):
    docs, _ = category
    tree = _recursive(
        docs.filter((F.col("level") == 1) & (F.col("item_count") > 200)),
        docs, step_filter=F.col("c.is_active"))
    got = tree.select("name", "level", "item_count") \
        .orderBy("level", F.col("item_count").desc(), "name").collect()
    # reference ordering within equal (level, item_count) follows the
    # working-table order; name is a deterministic stand-in tiebreak
    assert [(r["name"], r["level"], r["item_count"]) for r in got] == [
        ("Books", 1, 500), ("Clothing", 1, 300), ("Electronics", 1, 250),
        ("Non-Fiction", 2, 250), ("Fiction", 2, 200), ("Women", 2, 150),
        ("Smartphones", 2, 120), ("Men", 2, 100), ("Computers", 2, 80),
        ("Academic", 2, 50), ("Audio", 2, 50), ("Children", 2, 50),
        ("Android", 3, 60), ("iOS", 3, 50), ("Laptops", 3, 40),
        ("Desktops", 3, 30), ("Headphones", 3, 30), ("Speakers", 3, 15),
        ("Other", 3, 10), ("Tablets", 3, 10), ("Receivers", 3, 5)]


def test_search_in_base_case_keeps_duplicate_paths(category):
    """Base case description @@@ 'books' seeds {Books, Fiction,
    Non-Fiction}; walking Books reproduces Fiction/Non-Fiction (UNION
    ALL keeps both paths) and discovers Academic."""
    docs, idx = category
    m = compile_query(idx, ast.Parse("books", field="description")) \
        .select("doc_id")
    base = docs.join(m, docs["id"] == m["doc_id"], "left_semi")
    tree = _recursive(base, docs)
    got = tree.select("name", "level", "description", "item_count") \
        .orderBy("level", "name").collect()
    assert [tuple(r) for r in got] == [
        ("Books", 1, "Books and literature", 500),
        ("Academic", 2, "Textbooks and academic materials", 50),
        ("Fiction", 2, "Fiction books and novels", 200),
        ("Fiction", 2, "Fiction books and novels", 200),
        ("Non-Fiction", 2, "Non-fiction and reference books", 250),
        ("Non-Fiction", 2, "Non-fiction and reference books", 250)]


def test_search_in_recursive_case(category):
    """Recursive step gated on description @@@ 'computer' OR
    item_count > 30 prunes whole subtrees mid-walk."""
    docs, idx = category
    m = compile_query(idx, ast.Parse("computer", field="description")) \
        .select(F.col("doc_id").alias("__mid"))
    docs_m = docs.join(m, docs["id"] == F.col("__mid"), "left") \
        .withColumn("__hit", F.col("__mid").isNotNull()).drop("__mid")
    base = docs_m.filter(F.col("name") == "Electronics")
    tree = _recursive(base, docs_m,
                      step_filter=F.col("c.__hit") | (F.col("c.item_count") > 30))
    got = tree.select("name", "level", "description", "item_count") \
        .orderBy("level", "name").collect()
    assert [tuple(r) for r in got] == [
        ("Electronics", 1, "Electronic devices and accessories", 250),
        ("Audio", 2, "Speakers, headphones, and audio equipment", 50),
        ("Computers", 2, "Desktop and laptop computers", 80),
        ("Smartphones", 2, "Mobile phones and accessories", 120),
        ("Android", 3, "Android smartphones", 60),
        ("Laptops", 3, "Portable computers", 40),
        ("iOS", 3, "iPhones and iOS devices", 50)]


def test_recursive_aggregation(category):
    docs, _ = category
    tree = _recursive(docs.filter(F.col("level") == 1), docs)
    typed = tree.withColumn(
        "category_type",
        F.when(F.col("level") == 1, "Main Category")
        .when(F.col("level") == 2, "Subcategory")
        .otherwise("Sub-subcategory"))
    got = (typed.groupBy("category_type")
           .agg(F.count("*").alias("category_count"),
                F.sum("item_count").alias("total_items"),
                F.avg("item_count").alias("avg_items"))
           .orderBy("category_type").collect())
    assert [(r["category_type"], r["category_count"], r["total_items"])
            for r in got] == [
        ("Main Category", 4, 1230),
        ("Sub-subcategory", 9, 250),
        ("Subcategory", 12, 1230)]
    assert got[0]["avg_items"] == pytest.approx(307.5)
    assert got[1]["avg_items"] == pytest.approx(250 / 9)
    assert got[2]["avg_items"] == pytest.approx(102.5)


def test_recursive_with_active_gate(category):
    """Full Electronics walk gated on is_active (all active → same set,
    the reference's verification query)."""
    docs, _ = category
    tree = _recursive(docs.filter(F.col("name") == "Electronics"), docs,
                      step_filter=F.col("c.is_active"))
    got = tree.select("name", "level", "item_count") \
        .orderBy("level", "name").collect()
    assert [r["name"] for r in got] == [
        "Electronics", "Audio", "Computers", "Smartphones",
        "Android", "Desktops", "Headphones", "Laptops", "Other",
        "Receivers", "Speakers", "Tablets", "iOS"]
