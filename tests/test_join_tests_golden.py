"""join_tests.out golden (PUBLIC reference behavior, tables replicated
inline): cross-table OR corner cases through every join shape — inner/
left/right/cross/self joins, non-equi conditions, nested AND/OR mixing
search and plain predicates, per-row scores that stay 0 on rows admitted
by the OTHER table's arm, and UNION ALL score comparison.  All score
values are the reference's printed float32 output.

Two reference behaviors modeled structurally:
- books' bm25 key_field is ``id``, which is NOT unique (two books share
  id=1 under PK (id, author_id)).  Tantivy still indexes each heap row
  as its own document (scores differ per row), while a cross-table OR
  arm like ``b.content @@@ 'technology'`` admits rows BY KEY — 'Harry
  Potter Horrors' (id=1, no 'technology') is admitted because its
  id-sibling matched (join_tests.out Test 1.1).  Here each row is a doc
  under a surrogate ``rk`` and key admission is a semi-join on ``id``.
- reviews stays EMPTY and bridge_table absent: the reference's own
  setup INSERTs fail on FK violations (pinned in the .out file).

Reference ERRORs not replicated (documented divergence, not parity
theater): Tests 1.4/2.4/4.3/5.2/6.2/7.1 abort with "Unsupported query
shape" — the reference joinscan's own limitation on ON-clause extra
conditions / var-scope mixes, acknowledged in its issue tracker.  This
engine computes those queries fine; there is no expected output to pin.

Ref: pg_search/tests/pg_regress/expected/join_tests.out
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

AUTHORS = [
    (1, "J.K. Rowling", "British author famous for Harry Potter magic "
     "series", "UK", 1965, True),
    (2, "Stephen King", "American author of horror and supernatural "
     "fiction terror", "USA", 1947, True),
    (3, "Agatha Christie", "English writer known for detective mystery "
     "novels", "UK", 1890, False),
    (4, "George Orwell", "English novelist and essayist technology "
     "writer", "UK", 1903, False),
    (5, "Jane Austen", "English novelist known for romantic fiction "
     "love stories", "UK", 1775, False),
    (6, "John Smith", "Famous science fiction author smartphone "
     "technology", "USA", 1960, True),
]
CATEGORIES = [
    (1, "Fantasy", "Fantasy and magical realism books with magic spells",
     True),
    (2, "Horror", "Horror and thriller books with terror elements", True),
    (3, "Mystery", "Detective and mystery books with investigation", True),
    (4, "Classic", "Classic literature books with timeless stories", True),
    (5, "Romance", "Romantic fiction books with love stories", False),
    (6, "Technology", "Technology and science publications with "
     "innovation", True),
]
PUBLISHERS = [
    (1, "TechBooks Publishing",
     "technology and science publications with innovation", 1990),
    (2, "Mystery House Press",
     "crime and mystery novels with detective stories", 1985),
    (3, "Romance World", "romantic fiction publisher with love stories",
     2000),
    (4, "Academic Press", "educational and technical books with "
     "performance", 1975),
    (5, "Magic Books", "fantasy and magical publications with spells",
     1980),
]
# (rk, id, title, content, author_id, category_id, publisher_id,
#  publication_year, is_published, rating, price)
BOOKS = [
    ("1#1", 1, "Harry Potter Magic",
     "A magical story about wizards and magic spells technology",
     1, 1, 5, 1997, True, 4.8, 29.99),
    ("1#2", 1, "Harry Potter Horrors",
     "A magical story about wizards and magic spells",
     2, 1, 5, 1997, True, 4.8, 29.99),
    ("2#2", 2, "The Shining Terror",
     "A horror story about supernatural terror events performance",
     2, 2, 4, 1977, True, 4.5, 19.99),
    ("3#3", 3, "Murder Mystery Case",
     "A detective story with mystery and murder investigation",
     3, 3, 2, 1934, True, 4.2, 39.99),
    ("4#4", 4, "Dystopian Future",
     "A story about totalitarian surveillance and technology control",
     4, 4, 4, 1949, True, 4.7, 24.99),
    ("5#5", 5, "Pride Romance",
     "A romantic story about love and prejudice relationships",
     5, 5, 3, 1813, False, 4.6, 34.99),
    ("6#1", 6, "Magic Detective",
     "A mystery story with magical elements and detective work",
     1, 3, 5, 2001, True, 4.1, 21.99),
    ("7#6", 7, "Smartphone Tech",
     "Advanced smartphone technology with innovation features",
     6, 6, 1, 2020, True, 4.3, 699.99),
    ("8#6", 8, "Future Technologies",
     "artificial intelligence machine learning robots performance",
     6, 6, 1, 2020, True, 4.4, 89.99),
]


def _f32(x):
    return float(np.float32(x))


@pytest.fixture(scope="module")
def lib(spark):
    authors = spark.createDataFrame(
        AUTHORS, "id int, name string, bio string, country string, "
        "birth_year int, is_active boolean")
    categories = spark.createDataFrame(
        CATEGORIES, "id int, name string, description string, "
        "is_active boolean")
    publishers = spark.createDataFrame(
        PUBLISHERS, "id int, name string, description string, "
        "founded_year int")
    books = spark.createDataFrame(
        BOOKS, "rk string, id int, title string, content string, "
        "author_id int, category_id int, publisher_id int, "
        "publication_year int, is_published boolean, rating double, "
        "price double")
    a_idx = build_index(authors, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="name"),
                                     FieldConfig(name="bio"),
                                     FieldConfig(name="country")]))
    b_idx = build_index(books, IndexSchema(
        key_field="rk", text_fields=[FieldConfig(name="title"),
                                     FieldConfig(name="content")]))
    c_idx = build_index(categories, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="name"),
                                     FieldConfig(name="description")]))
    p_idx = build_index(publishers, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="name"),
                                     FieldConfig(name="description")]))
    return {"authors": authors, "categories": categories,
            "publishers": publishers, "books": books,
            "a": a_idx, "b": b_idx, "c": c_idx, "p": p_idx}


def _m(lib, which, q, tag):
    """Per-row match scores for one table: (key, <tag>_s) — key is the
    index key (rk for books, id otherwise); <tag>_s NULL on non-match."""
    return compile_query(lib[which], q).select(
        F.col("doc_id").alias(f"{tag}_k"), F.col("score").alias(f"{tag}_s"))


def _rows(df, *cols):
    out = []
    for r in df.collect():
        row = []
        for c in cols:
            v = r[c]
            row.append(_f32(v) if isinstance(v, float) else v)
        out.append(tuple(row))
    return out


def _sorted_eq(got, want):
    assert sorted(got) == sorted(
        [tuple(_f32(v) if isinstance(v, float) else v for v in w)
         for w in want])


def _score0(tag):
    return F.coalesce(F.col(f"{tag}_s"), F.lit(0.0))


def test_1_1_inner_join_cross_table_or_key_admission(lib):
    """Test 1.1: (a.bio @@@ 'science' OR b.content @@@ 'technology') —
    'Harry Potter Horrors' is admitted BY KEY (id=1 sibling matched)
    with per-row scores 0/0."""
    am = _m(lib, "a", ast.Parse("science", field="bio"), "a")
    bm = _m(lib, "b", ast.Parse("technology", field="content"), "b")
    bkeys = (lib["books"].join(bm, F.col("rk") == F.col("b_k"))
             .select(F.col("id").alias("kid")).distinct())
    j = (lib["authors"].alias("a")
         .join(lib["books"].alias("b"),
               F.col("a.id") == F.col("b.author_id"))
         .join(am, F.col("a.id") == F.col("a_k"), "left")
         .join(bm, F.col("b.rk") == F.col("b_k"), "left")
         .join(bkeys, F.col("b.id") == F.col("kid"), "left")
         .filter(F.col("a_k").isNotNull() | F.col("kid").isNotNull())
         .select(F.col("a.name").alias("author_name"),
                 F.col("b.title").alias("book_title"),
                 _score0("a").alias("author_score"),
                 _score0("b").alias("book_score")))
    _sorted_eq(_rows(j, "author_name", "book_title", "author_score",
                     "book_score"),
               [("J.K. Rowling", "Harry Potter Magic", 0.0, 0.98641),
                ("Stephen King", "Harry Potter Horrors", 0.0, 0.0),
                ("George Orwell", "Dystopian Future", 0.0, 1.0376933),
                ("John Smith", "Smartphone Tech", 1.6503524, 1.1581132),
                ("John Smith", "Future Technologies", 1.6503524, 0.0)])


def _or_join(lib, a_q, b_q, how="inner",
             on=("id", "author_id")):
    """authors ⋈ books with (a @@@ a_q OR b @@@ b_q) and per-row scores."""
    am = _m(lib, "a", a_q, "a")
    bm = _m(lib, "b", b_q, "b")
    return (lib["authors"].alias("a")
            .join(lib["books"].alias("b"),
                  F.col(f"a.{on[0]}") == F.col(f"b.{on[1]}"), how)
            .join(am, F.col("a.id") == F.col("a_k"), "left")
            .join(bm, F.col("b.rk") == F.col("b_k"), "left")
            .filter(F.col("a_k").isNotNull() | F.col("b_k").isNotNull())
            .select(F.col("a.name").alias("author_name"),
                    F.col("b.title").alias("book_title"),
                    F.col("b.content").alias("book_content"),
                    _score0("a").alias("author_score"),
                    _score0("b").alias("book_score"),
                    F.col("a.id").alias("aid"), F.col("b.id").alias("bid"),
                    F.col("a.country").alias("author_country")))


def test_1_2_left_join_or(lib):
    j = _or_join(lib, ast.Parse("mystery", field="bio"),
                 ast.Parse("romance", field="content"), "left")
    _sorted_eq(_rows(j, "author_name", "book_title", "author_score",
                     "book_score"),
               [("Agatha Christie", "Murder Mystery Case",
                 1.5552412, 0.0)])


def test_1_3_right_join_or(lib):
    j = _or_join(lib, ast.Parse("fiction", field="bio"),
                 ast.Parse("magic", field="content"), "right")
    _sorted_eq(_rows(j, "author_name", "book_title", "author_score",
                     "book_score"),
               [("J.K. Rowling", "Harry Potter Magic", 0.0, 1.3025584),
                ("Stephen King", "Harry Potter Horrors",
                 0.66167223, 1.3702781),
                ("Stephen King", "The Shining Terror", 0.66167223, 0.0),
                ("Jane Austen", "Pride Romance", 0.66167223, 0.0),
                ("John Smith", "Smartphone Tech", 0.74260163, 0.0),
                ("John Smith", "Future Technologies", 0.74260163, 0.0)])


def test_2_1_cross_join_or_limit(lib):
    """Test 2.1: CROSS JOIN, ordered (a.id, b.id) LIMIT 10 — tie order
    within duplicate b.id=1 is unpinned by the reference's own sort."""
    am = _m(lib, "a", ast.Parse("author", field="bio"), "a")
    bm = _m(lib, "b", ast.Parse("mystery", field="content"), "b")
    j = (lib["authors"].alias("a").crossJoin(lib["books"].alias("b"))
         .join(am, F.col("a.id") == F.col("a_k"), "left")
         .join(bm, F.col("b.rk") == F.col("b_k"), "left")
         .filter(F.col("a_k").isNotNull() | F.col("b_k").isNotNull())
         .orderBy("a.id", "b.id", "b.rk").limit(10)
         .select(F.col("a.name").alias("author_name"),
                 F.col("b.title").alias("book_title"),
                 _score0("a").alias("author_score"),
                 _score0("b").alias("book_score")))
    _sorted_eq(_rows(j, "author_name", "book_title", "author_score",
                     "book_score"),
               [("J.K. Rowling", "Harry Potter Horrors", 0.66167223, 0.0),
                ("J.K. Rowling", "Harry Potter Magic", 0.66167223, 0.0),
                ("J.K. Rowling", "The Shining Terror", 0.66167223, 0.0),
                ("J.K. Rowling", "Murder Mystery Case",
                 0.66167223, 1.3702781),
                ("J.K. Rowling", "Dystopian Future", 0.66167223, 0.0),
                ("J.K. Rowling", "Pride Romance", 0.66167223, 0.0),
                ("J.K. Rowling", "Magic Detective",
                 0.66167223, 1.3025584),
                ("J.K. Rowling", "Smartphone Tech", 0.66167223, 0.0),
                ("J.K. Rowling", "Future Technologies", 0.66167223, 0.0),
                ("Stephen King", "Harry Potter Magic", 0.66167223, 0.0)])


def test_2_2_non_equi_join_or(lib):
    """Test 2.2: ON a.birth_year < b.publication_year."""
    am = _m(lib, "a", ast.Parse("fiction", field="bio"), "a")
    bm = _m(lib, "b", ast.Parse("love", field="content"), "b")
    j = (lib["authors"].alias("a")
         .join(lib["books"].alias("b"),
               F.col("a.birth_year") < F.col("b.publication_year"))
         .join(am, F.col("a.id") == F.col("a_k"), "left")
         .join(bm, F.col("b.rk") == F.col("b_k"), "left")
         .filter(F.col("a_k").isNotNull() | F.col("b_k").isNotNull())
         .select(F.col("a.name").alias("author_name"),
                 F.col("b.title").alias("book_title"),
                 _score0("a").alias("author_score"),
                 _score0("b").alias("book_score")))
    fic = 0.66167223
    smith = 0.74260163
    want = [("Stephen King", t, fic, 0.0) for t in
            ["Harry Potter Magic", "Harry Potter Horrors",
             "The Shining Terror", "Dystopian Future", "Magic Detective",
             "Smartphone Tech", "Future Technologies"]]
    want += [("Jane Austen", t, fic, 0.0) for t in
             ["Harry Potter Magic", "Harry Potter Horrors",
              "The Shining Terror", "Murder Mystery Case",
              "Dystopian Future", "Magic Detective",
              "Smartphone Tech", "Future Technologies"]]
    want += [("Jane Austen", "Pride Romance", fic, 1.8752021)]
    want += [("John Smith", t, smith, 0.0) for t in
             ["Harry Potter Magic", "Harry Potter Horrors",
              "The Shining Terror", "Magic Detective",
              "Smartphone Tech", "Future Technologies"]]
    _sorted_eq(_rows(j, "author_name", "book_title", "author_score",
                     "book_score"), want)


def test_2_3_complex_non_equi_join_or(lib):
    """Test 2.3: ON a.birth_year + 50 > b.publication_year."""
    am = _m(lib, "a", ast.Parse("writer", field="bio"), "a")
    bm = _m(lib, "b", ast.Parse("programming", field="content"), "b")
    j = (lib["authors"].alias("a")
         .join(lib["books"].alias("b"),
               F.col("a.birth_year") + 50 > F.col("b.publication_year"))
         .join(am, F.col("a.id") == F.col("a_k"), "left")
         .join(bm, F.col("b.rk") == F.col("b_k"), "left")
         .filter(F.col("a_k").isNotNull() | F.col("b_k").isNotNull())
         .select(F.col("a.name").alias("author_name"),
                 F.col("b.title").alias("book_title"),
                 _score0("a").alias("author_score"),
                 _score0("b").alias("book_score")))
    _sorted_eq(_rows(j, "author_name", "book_title", "author_score",
                     "book_score"),
               [("Agatha Christie", "Murder Mystery Case", 1.0395092, 0.0),
                ("Agatha Christie", "Pride Romance", 1.0395092, 0.0),
                ("George Orwell", "Murder Mystery Case", 1.1030805, 0.0),
                ("George Orwell", "Dystopian Future", 1.1030805, 0.0),
                ("George Orwell", "Pride Romance", 1.1030805, 0.0)])


def test_3_1_cross_table_or_content(lib):
    am = _m(lib, "a", ast.Parse("smartphone", field="bio"), "a")
    bm = _m(lib, "b", ast.Parse("performance", field="content"), "b")
    j = (lib["authors"].alias("a").crossJoin(lib["books"].alias("b"))
         .join(am, F.col("a.id") == F.col("a_k"), "left")
         .join(bm, F.col("b.rk") == F.col("b_k"), "left")
         .filter(F.col("a_k").isNotNull() | F.col("b_k").isNotNull())
         .orderBy("a.id", "b.id").limit(10)
         .select(F.col("a.name").alias("author_name"),
                 F.col("b.content").alias("book_content"),
                 _score0("a").alias("author_score"),
                 _score0("b").alias("book_score")))
    shining = ("A horror story about supernatural terror events "
               "performance", 1.3702781)
    future = ("artificial intelligence machine learning robots "
              "performance", 1.5292932)
    want = []
    for a in ["J.K. Rowling", "Stephen King", "Agatha Christie",
              "George Orwell", "Jane Austen"]:
        want.append((a, shining[0], 0.0, shining[1]))
        want.append((a, future[0], 0.0, future[1]))
    _sorted_eq(_rows(j, "author_name", "book_content", "author_score",
                     "book_score"), want)


def test_3_2_three_table_or(lib):
    am = _m(lib, "a", ast.Parse("author", field="bio"), "a")
    bm = _m(lib, "b", ast.Parse("science", field="content"), "b")
    cm = _m(lib, "c", ast.Parse("technology", field="description"), "c")
    j = (lib["authors"].alias("a")
         .join(lib["books"].alias("b"),
               F.col("a.id") == F.col("b.author_id"))
         .crossJoin(lib["categories"].alias("c"))
         .join(am, F.col("a.id") == F.col("a_k"), "left")
         .join(bm, F.col("b.rk") == F.col("b_k"), "left")
         .join(cm, F.col("c.id") == F.col("c_k"), "left")
         .filter(F.col("a_k").isNotNull() | F.col("b_k").isNotNull() |
                 F.col("c_k").isNotNull())
         .orderBy("a.id", "b.id", "c.id").limit(10)
         .select(F.col("a.name").alias("author_name"),
                 F.col("b.title").alias("book_title"),
                 F.col("c.name").alias("category_name"),
                 _score0("a").alias("author_score"),
                 _score0("b").alias("book_score"),
                 _score0("c").alias("category_score")))
    rowl = 0.66167223
    want = [("J.K. Rowling", "Harry Potter Magic", c, rowl, 0.0,
             1.5904956 if c == "Technology" else 0.0)
            for c in ["Fantasy", "Horror", "Mystery", "Classic",
                      "Romance", "Technology"]]
    want += [("J.K. Rowling", "Magic Detective", c, rowl, 0.0, 0.0)
             for c in ["Fantasy", "Horror", "Mystery", "Classic"]]
    _sorted_eq(_rows(j, "author_name", "book_title", "category_name",
                     "author_score", "book_score", "category_score"), want)


def test_3_3_multiple_conditions_per_relation(lib):
    a_q = ast.Boolean(should=[ast.Parse("smartphone", field="bio"),
                              ast.Parse("British", field="country")])
    am = _m(lib, "a", a_q, "a")
    bm = _m(lib, "b", ast.Parse("performance", field="content"), "b")
    j = (lib["authors"].alias("a").crossJoin(lib["books"].alias("b"))
         .join(am, F.col("a.id") == F.col("a_k"), "left")
         .join(bm, F.col("b.rk") == F.col("b_k"), "left")
         .filter(F.col("a_k").isNotNull() | F.col("b_k").isNotNull())
         .orderBy("a.id", "b.id").limit(10)
         .select(F.col("a.name").alias("author_name"),
                 F.col("a.country").alias("author_country"),
                 F.col("b.content").alias("book_content"),
                 _score0("a").alias("author_score"),
                 _score0("b").alias("book_score")))
    shin = ("A horror story about supernatural terror events performance",
            1.3702781)
    fut = ("artificial intelligence machine learning robots performance",
           1.5292932)
    want = []
    for a, ctry in [("J.K. Rowling", "UK"), ("Stephen King", "USA"),
                    ("Agatha Christie", "UK"), ("George Orwell", "UK"),
                    ("Jane Austen", "UK")]:
        want.append((a, ctry, shin[0], 0.0, shin[1]))
        want.append((a, ctry, fut[0], 0.0, fut[1]))
    _sorted_eq(_rows(j, "author_name", "author_country", "book_content",
                     "author_score", "book_score"), want)


def test_4_1_mixed_search_and_plain_or(lib):
    """Test 4.1: OR of two search arms and b.price > 25."""
    am = _m(lib, "a", ast.Parse("science", field="bio"), "a")
    bm = _m(lib, "b", ast.Parse("mystery", field="content"), "b")
    j = (lib["authors"].alias("a")
         .join(lib["books"].alias("b"),
               F.col("a.id") == F.col("b.author_id"))
         .join(am, F.col("a.id") == F.col("a_k"), "left")
         .join(bm, F.col("b.rk") == F.col("b_k"), "left")
         .filter(F.col("a_k").isNotNull() | F.col("b_k").isNotNull() |
                 (F.col("b.price") > 25.00))
         .select(F.col("a.name").alias("author_name"),
                 F.col("b.title").alias("book_title"),
                 _score0("a").alias("author_score"),
                 _score0("b").alias("book_score")))
    _sorted_eq(_rows(j, "author_name", "book_title", "author_score",
                     "book_score"),
               [("J.K. Rowling", "Harry Potter Magic", 0.0, 0.0),
                ("J.K. Rowling", "Magic Detective", 0.0, 1.3025584),
                ("Stephen King", "Harry Potter Horrors", 0.0, 0.0),
                ("Agatha Christie", "Murder Mystery Case",
                 0.0, 1.3702781),
                ("Jane Austen", "Pride Romance", 0.0, 0.0),
                ("John Smith", "Smartphone Tech", 1.6503524, 0.0),
                ("John Smith", "Future Technologies", 1.6503524, 0.0)])


def test_4_2_nested_and_or(lib):
    """Test 4.2: (a @@@ ... AND a.birth_year > 1950) OR
    (b @@@ ... AND b.publication_year > 1980)."""
    am = _m(lib, "a", ast.Parse("smartphone", field="bio"), "a")
    bm = _m(lib, "b", ast.Parse("magic", field="content"), "b")
    j = (lib["authors"].alias("a")
         .join(lib["books"].alias("b"),
               F.col("a.id") == F.col("b.author_id"))
         .join(am, F.col("a.id") == F.col("a_k"), "left")
         .join(bm, F.col("b.rk") == F.col("b_k"), "left")
         .filter((F.col("a_k").isNotNull() &
                  (F.col("a.birth_year") > 1950)) |
                 (F.col("b_k").isNotNull() &
                  (F.col("b.publication_year") > 1980)))
         .select(F.col("a.name").alias("author_name"),
                 F.col("b.title").alias("book_title"),
                 _score0("a").alias("author_score"),
                 _score0("b").alias("book_score")))
    _sorted_eq(_rows(j, "author_name", "book_title", "author_score",
                     "book_score"),
               [("J.K. Rowling", "Harry Potter Magic", 0.0, 1.3025584),
                ("Stephen King", "Harry Potter Horrors", 0.0, 1.3702781),
                ("John Smith", "Smartphone Tech", 1.6503524, 0.0),
                ("John Smith", "Future Technologies", 1.6503524, 0.0)])


def test_4_4_no_match_and_chain(lib):
    """Test 4.4: all-AND chain with two unmatchable search arms."""
    am = _m(lib, "a", ast.Parse("laptop", field="bio"), "a")
    cm = _m(lib, "c", ast.Parse("Electronics", field="name"), "c")
    j = (lib["authors"].alias("a")
         .join(lib["categories"].alias("c"),
               F.col("a.id") == F.col("c.id"))
         .join(am, F.col("a.id") == F.col("a_k"))
         .join(cm, F.col("c.id") == F.col("c_k"))
         .filter(F.col("a.birth_year") > 1000))
    assert j.count() == 0


def test_5_1_self_join_no_shared_birth_year(lib):
    am1 = _m(lib, "a", ast.Parse("fiction", field="bio"), "a")
    am2 = _m(lib, "a", ast.Parse("mystery", field="bio"), "x")
    a1 = lib["authors"].alias("a1")
    a2 = lib["authors"].alias("a2")
    j = (a1.join(a2, (F.col("a1.birth_year") == F.col("a2.birth_year")) &
                 (F.col("a1.id") != F.col("a2.id")))
         .join(am1, F.col("a1.id") == F.col("a_k"), "left")
         .join(am2, F.col("a2.id") == F.col("x_k"), "left")
         .filter(F.col("a_k").isNotNull() | F.col("x_k").isNotNull()))
    assert j.count() == 0


def test_5_3_left_join_or_story(lib):
    j = _or_join(lib, ast.Parse("author", field="bio"),
                 ast.Parse("story", field="content"), "left")
    _sorted_eq(_rows(j, "author_name", "book_title", "author_score",
                     "book_score"),
               [("J.K. Rowling", "Harry Potter Magic",
                 0.66167223, 0.27030534),
                ("J.K. Rowling", "Magic Detective",
                 0.66167223, 0.27030534),
                ("Stephen King", "Harry Potter Horrors",
                 0.66167223, 0.28435844),
                ("Stephen King", "The Shining Terror",
                 0.66167223, 0.28435844),
                ("Agatha Christie", "Murder Mystery Case",
                 0.0, 0.28435844),
                ("George Orwell", "Dystopian Future", 0.0, 0.28435844),
                ("Jane Austen", "Pride Romance", 0.0, 0.28435844),
                ("John Smith", "Smartphone Tech", 0.74260163, 0.0),
                ("John Smith", "Future Technologies", 0.74260163, 0.0)])


def test_5_4_null_generating_join_and_arm(lib):
    """Test 5.4: a @@@ 'author' OR (b @@@ 'story' AND c @@@ 'Fantasy')
    through two LEFT JOINs; scores stay per-row per-arm."""
    am = _m(lib, "a", ast.Parse("author", field="bio"), "a")
    bm = _m(lib, "b", ast.Parse("story", field="content"), "b")
    cm = _m(lib, "c", ast.Parse("Fantasy", field="name"), "c")
    j = (lib["authors"].alias("a")
         .join(lib["books"].alias("b"),
               F.col("a.id") == F.col("b.author_id"), "left")
         .join(lib["categories"].alias("c"),
               F.col("b.category_id") == F.col("c.id"), "left")
         .join(am, F.col("a.id") == F.col("a_k"), "left")
         .join(bm, F.col("b.rk") == F.col("b_k"), "left")
         .join(cm, F.col("c.id") == F.col("c_k"), "left")
         .filter(F.col("a_k").isNotNull() |
                 (F.col("b_k").isNotNull() & F.col("c_k").isNotNull()))
         .orderBy("a.id", "b.id", "c.id").limit(15)
         .select(F.col("a.name").alias("author_name"),
                 F.col("b.title").alias("book_title"),
                 F.col("c.name").alias("category_name"),
                 _score0("a").alias("author_score"),
                 _score0("b").alias("book_score"),
                 _score0("c").alias("category_score")))
    _sorted_eq(_rows(j, "author_name", "book_title", "category_name",
                     "author_score", "book_score", "category_score"),
               [("J.K. Rowling", "Harry Potter Magic", "Fantasy",
                 0.66167223, 0.27030534, 1.5404451),
                ("J.K. Rowling", "Magic Detective", "Mystery",
                 0.66167223, 0.27030534, 0.0),
                ("Stephen King", "Harry Potter Horrors", "Fantasy",
                 0.66167223, 0.28435844, 1.5404451),
                ("Stephen King", "The Shining Terror", "Horror",
                 0.66167223, 0.28435844, 0.0),
                ("John Smith", "Smartphone Tech", "Technology",
                 0.74260163, 0.0, 0.0),
                ("John Smith", "Future Technologies", "Technology",
                 0.74260163, 0.0, 0.0)])


def test_6_1_score_consistency_direct_vs_join(lib):
    am = _m(lib, "a", ast.Parse("author", field="bio"), "a")
    direct = (lib["authors"].join(am, F.col("id") == F.col("a_k"))
              .select("name", F.col("a_s").alias("author_score")))
    _sorted_eq(_rows(direct, "name", "author_score"),
               [("J.K. Rowling", 0.66167223),
                ("Stephen King", 0.66167223),
                ("John Smith", 0.74260163)])
    joined = (lib["authors"].alias("a")
              .join(lib["books"].alias("b"),
                    F.col("a.id") == F.col("b.author_id"))
              .join(am, F.col("a.id") == F.col("a_k"))
              .select(F.col("a.name").alias("name"),
                      F.col("a_s").alias("author_score")))
    _sorted_eq(_rows(joined, "name", "author_score"),
               [("J.K. Rowling", 0.66167223), ("J.K. Rowling", 0.66167223),
                ("Stephen King", 0.66167223), ("Stephen King", 0.66167223),
                ("John Smith", 0.74260163), ("John Smith", 0.74260163)])


def test_6_3_unpushable_or_arm(lib):
    """Test 6.3: a @@@ 'smartphone' OR a.birth_year = b.publication_year
    (never true) over a cross join, LIMIT 5 by (a.id, b.id, rk)."""
    am = _m(lib, "a", ast.Parse("smartphone", field="bio"), "a")
    j = (lib["authors"].alias("a").crossJoin(lib["books"].alias("b"))
         .join(am, F.col("a.id") == F.col("a_k"), "left")
         .filter(F.col("a_k").isNotNull() |
                 (F.col("a.birth_year") == F.col("b.publication_year")))
         .orderBy("a.id", "b.id", "b.rk").limit(5)
         .select(F.col("a.name").alias("author_name"),
                 F.col("b.title").alias("book_title"),
                 _score0("a").alias("author_score")))
    _sorted_eq(_rows(j, "author_name", "book_title", "author_score"),
               [("John Smith", "Harry Potter Magic", 1.6503524),
                ("John Smith", "Harry Potter Horrors", 1.6503524),
                ("John Smith", "The Shining Terror", 1.6503524),
                ("John Smith", "Murder Mystery Case", 1.6503524),
                ("John Smith", "Dystopian Future", 1.6503524)])


def test_7_2_conservative_or_three_tables(lib):
    am = _m(lib, "a", ast.Parse("smartphone", field="bio"), "a")
    cm = _m(lib, "c", ast.Parse("electronic", field="description"), "c")
    j = (lib["authors"].alias("a")
         .join(lib["books"].alias("b"),
               F.col("a.id") == F.col("b.author_id"))
         .join(lib["categories"].alias("c"),
               F.col("b.category_id") == F.col("c.id"))
         .join(am, F.col("a.id") == F.col("a_k"), "left")
         .join(cm, F.col("c.id") == F.col("c_k"), "left")
         .filter(F.col("a_k").isNotNull() | F.col("c_k").isNotNull())
         .select(F.col("a.name").alias("author_name"),
                 F.col("c.name").alias("category_name"),
                 _score0("a").alias("author_score"),
                 _score0("c").alias("category_score")))
    _sorted_eq(_rows(j, "author_name", "category_name", "author_score",
                     "category_score"),
               [("John Smith", "Technology", 1.6503524, 0.0),
                ("John Smith", "Technology", 1.6503524, 0.0)])


def test_8_1_union_all_score_comparison(lib):
    am = _m(lib, "a", ast.Parse("smartphone", field="bio"), "a")
    bm = _m(lib, "b", ast.Parse("performance", field="content"), "b")
    left = (lib["authors"].join(am, F.col("id") == F.col("a_k"))
            .select(F.lit("Single table A - smartphone")
                    .alias("query_type"),
                    F.col("name"), F.col("a_s").alias("score")))
    right = (lib["books"].join(bm, F.col("rk") == F.col("b_k"))
             .select(F.lit("Single table B - performance")
                     .alias("query_type"),
                     F.col("title").alias("name"),
                     F.col("b_s").alias("score")))
    got = _rows(left.unionAll(right).orderBy(F.col("score").desc()),
                "query_type", "name", "score")
    assert got == [
        ("Single table A - smartphone", "John Smith", _f32(1.6503524)),
        ("Single table B - performance", "Future Technologies",
         _f32(1.5292932)),
        ("Single table B - performance", "The Shining Terror",
         _f32(1.3702781))]


def test_8_2_complex_real_world(lib):
    """Test 8.2: four LEFT JOINs, per-table two-arm should Booleans."""
    am = _m(lib, "a", ast.Boolean(should=[
        ast.Parse("technology", field="bio"),
        ast.Parse("British", field="country")]), "a")
    bm = _m(lib, "b", ast.Boolean(should=[
        ast.Parse("performance", field="content"),
        ast.Parse("magic", field="title")]), "b")
    cm = _m(lib, "c", ast.Boolean(should=[
        ast.Parse("innovation", field="description"),
        ast.Parse("Fantasy", field="name")]), "c")
    pm = _m(lib, "p", ast.Boolean(should=[
        ast.Parse("technology", field="description"),
        ast.Parse("Academic", field="name")]), "p")
    j = (lib["authors"].alias("a")
         .join(lib["books"].alias("b"),
               F.col("a.id") == F.col("b.author_id"), "left")
         .join(lib["categories"].alias("c"),
               F.col("b.category_id") == F.col("c.id"), "left")
         .join(lib["publishers"].alias("p"),
               F.col("b.publisher_id") == F.col("p.id"), "left")
         .join(am, F.col("a.id") == F.col("a_k"), "left")
         .join(bm, F.col("b.rk") == F.col("b_k"), "left")
         .join(cm, F.col("c.id") == F.col("c_k"), "left")
         .join(pm, F.col("p.id") == F.col("p_k"), "left")
         .filter(F.col("a_k").isNotNull() | F.col("b_k").isNotNull() |
                 F.col("c_k").isNotNull() | F.col("p_k").isNotNull())
         .orderBy("a.id", "b.id", "c.id", "p.id").limit(15)
         .select(F.col("a.name").alias("author_name"),
                 F.col("b.title").alias("book_title"),
                 F.col("c.name").alias("category_name"),
                 F.col("p.name").alias("publisher_name"),
                 _score0("a").alias("author_score"),
                 _score0("b").alias("book_score"),
                 _score0("c").alias("category_score"),
                 _score0("p").alias("publisher_score")))
    _sorted_eq(
        _rows(j, "author_name", "book_title", "category_name",
              "publisher_name", "author_score", "book_score",
              "category_score", "publisher_score"),
        [("J.K. Rowling", "Harry Potter Magic", "Fantasy", "Magic Books",
          0.0, 1.2683676, 1.5404451, 0.0),
         ("J.K. Rowling", "Magic Detective", "Mystery", "Magic Books",
          0.0, 1.4976931, 0.0, 0.0),
         ("Stephen King", "Harry Potter Horrors", "Fantasy",
          "Magic Books", 0.0, 0.0, 1.5404451, 0.0),
         ("Stephen King", "The Shining Terror", "Horror",
          "Academic Press", 0.0, 1.3702781, 0.0, 1.4398423),
         ("George Orwell", "Dystopian Future", "Classic",
          "Academic Press", 1.1030805, 0.0, 0.0, 1.4398423),
         ("John Smith", "Smartphone Tech", "Technology",
          "TechBooks Publishing", 1.1030805, 0.0, 1.5904956, 1.4048332),
         ("John Smith", "Future Technologies", "Technology",
          "TechBooks Publishing", 1.1030805, 1.5292932, 1.5904956,
          1.4048332)])
