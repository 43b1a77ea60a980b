"""columnar_advanced_05_union_window_functions golden (PUBLIC reference
behavior, corpus replicated inline): UNION / UNION ALL across two
indexed tables with per-branch search + range predicates, and window
functions (ROW_NUMBER, running AVG, RANK over a UNION CTE) over search
matches.  Note the reference's `title @@@ 'Book A'` parse is a
disjunction of [book, a] — the 'book' token matches every title in both
tables, so the range predicates do the real filtering.

Ref: pg_search/tests/pg_regress/expected/
     columnar_advanced_05_union_window_functions.out
     pg_search/tests/pg_regress/common/columnar_advanced_setup.sql
"""

import pytest
from pyspark.sql import functions as F, Window as W

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


def _parse(block):
    rows = []
    for line in block.strip().splitlines():
        cells = [c.strip() for c in line.split("|")]
        out = []
        for c in cells:
            try:
                out.append(int(c))
            except ValueError:
                try:
                    out.append(float(c))
                except ValueError:
                    out.append(c)
        rows.append(tuple(out))
    return rows


def _books_a():
    return [(i, f"Book A{i}", f"Author {1 + (i % 10)}",
             float(3 + (i % 3)), 2000 + (i % 22), float(10 + i * 5),
             i % 3 != 0) for i in range(1, 51)]


def _books_b():
    return [(i, f"Book B{i}", f"Author {1 + (i % 15)}",
             float(1 + (i % 5)), 1980 + (i % 40), float(15 + i * 3),
             i % 4 != 0) for i in range(1, 51)]


DDL = ("id int, title string, author string, rating double, year int, "
       "price double, is_published boolean")
SCHEMA_FIELDS = [FieldConfig(name="title"), FieldConfig(name="author")]


@pytest.fixture(scope="module")
def union_tabs(spark):
    a = spark.createDataFrame(_books_a(), DDL)
    b = spark.createDataFrame(_books_b(), DDL)
    ia = build_index(a, IndexSchema(key_field="id",
                                    text_fields=list(SCHEMA_FIELDS)))
    ib = build_index(b, IndexSchema(key_field="id",
                                    text_fields=list(SCHEMA_FIELDS)))
    return a, b, ia, ib


def _match(docs, idx, q):
    m = compile_query(idx, q).select("doc_id")
    return docs.join(m, docs["id"] == m["doc_id"], "left_semi")


UNION_RATING = """
 Book A11 | Author 2  |      5 |    65
 Book A14 | Author 5  |      5 |    80
 Book A17 | Author 8  |      5 |    95
 Book A2  | Author 3  |      5 |    20
 Book A20 | Author 1  |      5 |   110
 Book A23 | Author 4  |      5 |   125
 Book A26 | Author 7  |      5 |   140
 Book A29 | Author 10 |      5 |   155
 Book A32 | Author 3  |      5 |   170
 Book A35 | Author 6  |      5 |   185
 Book A38 | Author 9  |      5 |   200
 Book A41 | Author 2  |      5 |   215
 Book A44 | Author 5  |      5 |   230
 Book A47 | Author 8  |      5 |   245
 Book A5  | Author 6  |      5 |    35
 Book A50 | Author 1  |      5 |   260
 Book A8  | Author 9  |      5 |    50
 Book B14 | Author 15 |      5 |    57
 Book B19 | Author 5  |      5 |    72
 Book B24 | Author 10 |      5 |    87
 Book B29 | Author 15 |      5 |   102
 Book B34 | Author 5  |      5 |   117
 Book B39 | Author 10 |      5 |   132
 Book B4  | Author 5  |      5 |    27
 Book B44 | Author 15 |      5 |   147
 Book B49 | Author 5  |      5 |   162
 Book B9  | Author 10 |      5 |    42
 Book B13 | Author 14 |      4 |    54
 Book B18 | Author 4  |      4 |    69
 Book B23 | Author 9  |      4 |    84
 Book B28 | Author 14 |      4 |    99
 Book B3  | Author 4  |      4 |    24
 Book B33 | Author 4  |      4 |   114
 Book B38 | Author 9  |      4 |   129
 Book B43 | Author 14 |      4 |   144
 Book B48 | Author 4  |      4 |   159
 Book B8  | Author 9  |      4 |    39
"""


def test_union_dedup_search_branches(union_tabs):
    a, b, ia, ib = union_tabs
    qa = _match(a, ia, ast.Parse("Book A", field="title")) \
        .filter(F.col("rating") > 4)
    qb = _match(b, ib, ast.Parse("Book B", field="title")) \
        .filter(F.col("rating") > 3)
    cols = ["title", "author", "rating", "price"]
    got = (qa.select(*cols).union(qb.select(*cols)).distinct()
           .orderBy(F.col("rating").desc(), "title").collect())
    assert [tuple(r) for r in got] == _parse(UNION_RATING)


UNION_ALL_PRICE = """
 Book A1 |    15 | 2001
 Book A2 |    20 | 2002
 Book B3 |    24 | 1983
 Book A3 |    25 | 2003
 Book B4 |    27 | 1984
 Book B5 |    30 | 1985
 Book B6 |    33 | 1986
 Book B7 |    36 | 1987
 Book B8 |    39 | 1988
 Book B9 |    42 | 1989
"""


def test_union_all_numeric_branches(union_tabs):
    a, b, ia, ib = union_tabs
    qa = _match(a, ia, ast.Parse("Book A", field="title")) \
        .filter((F.col("price") < 30) & (F.col("year") > 2000))
    qb = _match(b, ib, ast.Parse("Book B", field="title")) \
        .filter((F.col("price") < 45) & (F.col("year") > 1982))
    cols = ["title", "price", "year"]
    got = qa.select(*cols).unionAll(qb.select(*cols)) \
        .orderBy("price").collect()
    assert [tuple(r) for r in got] == _parse(UNION_ALL_PRICE)


def test_row_number_partition_author_price(union_tabs):
    """(author, price) is unique in union_test_a, so every row_number is
    1 over the 50-row match set (reference rows all author_rank=1)."""
    a, _, ia, _ = union_tabs
    m = _match(a, ia, ast.Parse("Book A", field="title"))
    w = W.partitionBy("author", "price").orderBy(F.col("rating").desc())
    got = (m.select("title", "author", "price", "rating")
           .withColumn("author_rank", F.row_number().over(w))
           .orderBy("title", "author", "author_rank").collect())
    assert len(got) == 50
    assert all(r["author_rank"] == 1 for r in got)
    assert [tuple(r)[:4] for r in got[:3]] == [
        ("Book A1", "Author 2", 15.0, 4.0),
        ("Book A10", "Author 1", 60.0, 4.0),
        ("Book A11", "Author 2", 65.0, 5.0)]


RUNNING_AVG_FIRST = """
 Book A1  | Author 2  |    15 |                15
 Book A10 | Author 1  |    60 |                60
 Book A11 | Author 2  |    65 |                40
 Book A12 | Author 3  |    70 |                45
 Book A13 | Author 4  |    75 |                50
 Book A14 | Author 5  |    80 |                55
 Book A15 | Author 6  |    85 |                60
 Book A16 | Author 7  |    90 |                65
 Book A17 | Author 8  |    95 |                70
 Book A18 | Author 9  |   100 |                75
 Book A19 | Author 10 |   105 |                80
 Book A2  | Author 3  |    20 |                20
 Book A20 | Author 1  |   110 |                85
 Book A21 | Author 2  |   115 |                65
"""


def test_running_avg_window(union_tabs):
    a, _, ia, _ = union_tabs
    m = _match(a, ia, ast.Parse("Author", field="author"))
    w = W.partitionBy("author").orderBy("price")
    got = (m.select("title", "author", "price")
           .withColumn("running_avg_price", F.avg("price").over(w))
           .orderBy("title", "author", "price").collect())
    assert len(got) == 50
    assert [tuple(r) for r in got[:14]] == _parse(RUNNING_AVG_FIRST)
    # last row of the golden: Book A9, Author 10, 55, 55
    assert tuple(got[-1]) == ("Book A9", "Author 10", 55.0, 55.0)


RANK_UNION = """
 Book A1  | Author 2  |      4 | A      |           3
 Book A10 | Author 1  |      4 | A      |           3
 Book A11 | Author 2  |      5 | A      |           1
 Book A13 | Author 4  |      4 | A      |           2
 Book A14 | Author 5  |      5 | A      |           1
 Book A16 | Author 7  |      4 | A      |           2
 Book A17 | Author 8  |      5 | A      |           1
 Book A19 | Author 10 |      4 | A      |           5
 Book A2  | Author 3  |      5 | A      |           1
 Book A20 | Author 1  |      5 | A      |           1
 Book A22 | Author 3  |      4 | A      |           3
 Book A23 | Author 4  |      5 | A      |           1
 Book A25 | Author 6  |      4 | A      |           3
 Book A26 | Author 7  |      5 | A      |           1
 Book A28 | Author 9  |      4 | A      |           3
 Book A29 | Author 10 |      5 | A      |           1
 Book A31 | Author 2  |      4 | A      |           3
 Book A32 | Author 3  |      5 | A      |           1
 Book A34 | Author 5  |      4 | A      |           7
 Book A35 | Author 6  |      5 | A      |           1
 Book A37 | Author 8  |      4 | A      |           3
 Book A38 | Author 9  |      5 | A      |           1
 Book A4  | Author 5  |      4 | A      |           7
 Book A40 | Author 1  |      4 | A      |           3
 Book A41 | Author 2  |      5 | A      |           1
 Book A43 | Author 4  |      4 | A      |           2
 Book A44 | Author 5  |      5 | A      |           1
 Book A46 | Author 7  |      4 | A      |           2
 Book A47 | Author 8  |      5 | A      |           1
 Book A49 | Author 10 |      4 | A      |           5
 Book A5  | Author 6  |      5 | A      |           1
 Book A50 | Author 1  |      5 | A      |           1
 Book A7  | Author 8  |      4 | A      |           3
 Book A8  | Author 9  |      5 | A      |           1
 Book B12 | Author 13 |      3 | B      |           1
 Book B13 | Author 14 |      4 | B      |           1
 Book B14 | Author 15 |      5 | B      |           1
 Book B17 | Author 3  |      3 | B      |           4
 Book B18 | Author 4  |      4 | B      |           2
 Book B19 | Author 5  |      5 | B      |           1
 Book B2  | Author 3  |      3 | B      |           4
 Book B22 | Author 8  |      3 | B      |           5
 Book B23 | Author 9  |      4 | B      |           3
 Book B24 | Author 10 |      5 | B      |           1
 Book B27 | Author 13 |      3 | B      |           1
 Book B28 | Author 14 |      4 | B      |           1
 Book B29 | Author 15 |      5 | B      |           1
 Book B3  | Author 4  |      4 | B      |           2
 Book B32 | Author 3  |      3 | B      |           4
 Book B33 | Author 4  |      4 | B      |           2
 Book B34 | Author 5  |      5 | B      |           1
 Book B37 | Author 8  |      3 | B      |           5
 Book B38 | Author 9  |      4 | B      |           3
 Book B39 | Author 10 |      5 | B      |           1
 Book B4  | Author 5  |      5 | B      |           1
 Book B42 | Author 13 |      3 | B      |           1
 Book B43 | Author 14 |      4 | B      |           1
 Book B44 | Author 15 |      5 | B      |           1
 Book B47 | Author 3  |      3 | B      |           4
 Book B48 | Author 4  |      4 | B      |           2
 Book B49 | Author 5  |      5 | B      |           1
 Book B7  | Author 8  |      3 | B      |           5
 Book B8  | Author 9  |      4 | B      |           3
 Book B9  | Author 10 |      5 | B      |           1
"""


def test_rank_over_union_cte(union_tabs):
    """RANK() partitions merge rows from BOTH union branches (Author 5
    holds six rating-5 rows across A and B → the 4s rank 7)."""
    a, b, ia, ib = union_tabs
    qa = _match(a, ia, ast.Parse("Book A", field="title")) \
        .filter(F.col("rating") > 3.5) \
        .select("title", "author", "rating", F.lit("A").alias("source"))
    qb = _match(b, ib, ast.Parse("Book A", field="title")) \
        .filter(F.col("rating") > 2.5) \
        .select("title", "author", "rating", F.lit("B").alias("source"))
    combined = qa.union(qb).distinct()
    w = W.partitionBy("author").orderBy(F.col("rating").desc())
    got = (combined.withColumn("author_rank", F.rank().over(w))
           .orderBy("title", "author", "author_rank").collect())
    assert [tuple(r) for r in got] == _parse(RANK_UNION)
