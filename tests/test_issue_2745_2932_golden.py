"""issue_2745.out + issue_2932.out goldens (PUBLIC reference behavior,
corpora replicated inline):

- ``issue_2745.out`` — NOT EXISTS anti-join under a custom scan:
  SIMILAR TO regex + anti-join keeps 'Alice'; the IN-list DISTINCT
  variant keeps {17969, 17971, 17973} (17970 is on the exclusion
  list).  Both custom-scan on/off forms pin identical rows — here the
  single declarative plan is both.
- ``issue_2932.out`` — score EXPRESSIONS in ORDER BY: pdb.score(id)*2
  and pdb.score(id)*rating over 'shoes' OR rating>2.  The OR of an
  indexed text query and an indexed numeric range is a boolean SHOULD
  whose range arm contributes constant 1.0 (hence 3.4849067 =
  2.4849067 + 1), and the f64 products are pinned to the digit.

Ref: pg_search/tests/pg_regress/expected/issue_2745.out
     pg_search/tests/pg_regress/expected/issue_2932.out
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.fixtures import mock_items
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


# --- issue_2745.out ----------------------------------------------------------

def test_not_exists_anti_join(spark):
    contacts = spark.createDataFrame(
        [(17969, 1001, "Alice"), (17970, 1002, "Bob"),
         (17971, 1003, "Carol"), (17972, 1003, "Joe"),
         (17973, 1004, "Dave")],
        "contact_id long, company_id long, contact_name string")
    contact_list = spark.createDataFrame([(17970, "ABCD123")],
                                         "id long, list_id string")
    idx = build_index(contacts, IndexSchema(
        key_field="contact_id",
        text_fields=[FieldConfig(name="contact_name")],
        numeric_fields=["company_id"]))
    # SIMILAR TO 'Alice' (anchored regex) AND NOT EXISTS(...)
    got = (contacts.filter(F.col("contact_name").rlike("^(?:Alice)$"))
           .join(contact_list,
                 contacts["contact_id"] == contact_list["id"],
                 "left_anti")
           .select("contact_name").collect())
    assert [r[0] for r in got] == ["Alice"]
    # IN-list DISTINCT variant through the index (TermSet on the key)
    m = compile_query(idx, ast.TermSet("contact_id",
                                       [17969, 17970, 17971, 17973]))
    got = (contacts.join(m, contacts["contact_id"] == m["doc_id"],
                         "left_semi")
           .join(contact_list,
                 contacts["contact_id"] == contact_list["id"],
                 "left_anti")
           .select("contact_id").distinct().orderBy("contact_id")
           .collect())
    assert [r[0] for r in got] == [17969, 17971, 17973]


# --- issue_2932.out ----------------------------------------------------------

@pytest.fixture(scope="module")
def rated_idx(spark):
    docs = mock_items(spark)
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description")],
        numeric_fields=["rating"]))
    return docs, idx


def test_score_times_two_order(rated_idx):
    docs, idx = rated_idx
    m = compile_query(idx, ast.Parse("shoes", field="description"))
    got = (docs.join(m, docs["id"] == m["doc_id"])
           .select("description", (F.col("score") * 2).alias("score"))
           .orderBy(F.col("score").desc()).limit(3).collect())
    assert [(r["description"], r["score"]) for r in got] == [
        ("Generic shoes", 5.754520416259766),
        ("Sleek running shoes", 4.969813346862793),
        ("White jogging shoes", 4.969813346862793)]


def test_score_times_rating_or_range(rated_idx):
    docs, idx = rated_idx
    q = ast.Boolean(should=[ast.Parse("shoes", field="description"),
                            ast.Range("rating", lower=2,
                                      lower_inclusive=False)])
    m = compile_query(idx, q)
    j = docs.join(m, docs["id"] == m["doc_id"])
    got = (j.select("description", "rating",
                    (F.col("score") * F.col("rating")).alias("score"))
           .orderBy(F.col("score").desc(), "rating").limit(3).collect())
    assert [(r["description"], r["rating"], r["score"]) for r in got] \
        == [("Sleek running shoes", 5, 17.424533367156982),
            ("Generic shoes", 4, 15.509040832519531),
            ("White jogging shoes", 3, 10.45472002029419)]
    # both projections at once, ordered by raw score
    got = (j.select("description", "rating",
                    F.col("score").alias("score"),
                    (F.col("score") * F.col("rating"))
                    .alias("score_times_rating"))
           .orderBy(F.col("score").desc()).limit(3).collect())
    assert [(r["description"], r["rating"], np.float32(r["score"]),
             r["score_times_rating"]) for r in got] == [
        ("Generic shoes", 4, np.float32(3.8772602), 15.509040832519531),
        ("Sleek running shoes", 5, np.float32(3.4849067),
         17.424533367156982),
        ("White jogging shoes", 3, np.float32(3.4849067),
         10.45472002029419)]
