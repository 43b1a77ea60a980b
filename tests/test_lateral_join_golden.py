"""lateral-join.out golden (PUBLIC reference behavior, tables
replicated inline): LEFT JOIN LATERAL shapes over a search-filtered
driving side — latest-comment-per-article (lateral ORDER BY ... LIMIT
1 = a ranking window per key), lateral COUNT/AVG aggregates with
post-join HAVING-style filters, and a plain LEFT JOIN — with the
driving side's BM25 scores float32-exact (2.2999182, 1.4766761,
1.3164903).

Ref: pg_search/tests/pg_regress/expected/lateral-join.out
"""

import numpy as np
import pytest
from pyspark.sql import functions as F, Window as W

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

ARTICLES = [
    (1, "Understanding PostgreSQL",
     "PostgreSQL is a powerful database system with advanced features", 1),
    (2, "Machine Learning Basics",
     "Introduction to machine learning concepts and algorithms", 2),
    (3, "Cloud Native Applications",
     "Building applications for the cloud using modern patterns", 3),
    (4, "Database Security Best Practices",
     "How to secure your database systems effectively", 4),
    (5, "Web Development in 2024",
     "Modern web development tools and frameworks", 5),
    (6, "Advanced SQL Techniques",
     "Complex queries and optimization strategies for SQL", 1),
    (7, "Neural Networks Explained",
     "Deep dive into neural network architectures", 2),
    (8, "Kubernetes Deployment",
     "Deploying applications on Kubernetes clusters", 3),
    (9, "Zero Trust Security",
     "Implementing zero trust architecture in organizations", 4),
    (10, "React vs Vue Comparison",
     "Comparing popular frontend frameworks", 5),
    (11, "Computer Vision Applications",
     "Real world applications of computer vision technology", 2),
    (12, "Database Indexing Strategies",
     "How to optimize database performance with indexes", 1),
    (13, "Serverless Architecture",
     "Building serverless applications on AWS and Azure", 3),
    (14, "Encryption Fundamentals",
     "Understanding encryption algorithms and protocols", 4),
    (15, "GraphQL API Design",
     "Designing efficient GraphQL APIs for modern applications", 5),
]

AUTHORS = [(1, "John Doe"), (2, "Jane Smith"), (3, "Bob Johnson"),
           (4, "Alice Brown"), (5, "Charlie Wilson")]


@pytest.fixture(scope="module")
def blog(spark):
    articles = spark.createDataFrame(
        ARTICLES, "id long, title string, content string, author_id long")
    comments = spark.createDataFrame(
        [(g, (g % 15) + 1, f"Comment {g} about article", g, (g % 5) + 1)
         for g in range(1, 101)],
        "id long, article_id long, content string, hours long, "
        "rating long")
    aidx = build_index(articles, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="title"),
                     FieldConfig(name="content")]))
    return aidx, articles, comments


def _scored(aidx, articles, qstr):
    m = compile_query(aidx, ast.Parse(qstr, field="content"))
    return articles.join(m, articles["id"] == m["doc_id"]) \
        .drop("doc_id")


def test_lateral_latest_comment_topk(blog):
    aidx, articles, comments = blog
    a = _scored(aidx, articles, "database")
    # LATERAL (ORDER BY created_at DESC LIMIT 1) = ranking window
    w = W.partitionBy("article_id").orderBy(F.col("hours").desc())
    latest = (comments.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1)
              .select(F.col("article_id"),
                      F.col("id").alias("comment_id"),
                      F.col("content").alias("comment_content")))
    rows = (a.join(latest, a["id"] == latest["article_id"], "left")
            .orderBy(F.col("score").desc(), F.col("id").asc())
            .limit(5)
            .select("id", "title", "comment_id", "comment_content")
            .collect())
    assert [(r[0], r[1], r[2], r[3]) for r in rows] == [
        (4, "Database Security Best Practices", 93,
         "Comment 93 about article"),
        (12, "Database Indexing Strategies", 86,
         "Comment 86 about article"),
        (1, "Understanding PostgreSQL", 90, "Comment 90 about article")]


def test_technology_single_match_score(blog):
    aidx, articles, comments = blog
    rows = (_scored(aidx, articles, "technology")
            .orderBy(F.col("score").desc())
            .select("id", "title", "score").collect())
    assert [(r[0], r[1], np.float32(r[2])) for r in rows] == [
        (11, "Computer Vision Applications", np.float32("2.2999182"))]


def test_lateral_count_with_post_filter(blog):
    aidx, articles, comments = blog
    a = _scored(aidx, articles, "database")
    counts = (comments.groupBy("article_id")
              .agg(F.count("*").alias("comment_count")))
    rows = (a.join(counts, a["id"] == counts["article_id"], "left")
            .filter(F.col("comment_count") > 5)
            .orderBy(F.col("score").desc(), F.col("id").asc())
            .limit(5)
            .select("id", "title", "score", "comment_count").collect())
    assert [(r[0], r[1], np.float32(r[2]), r[3]) for r in rows] == [
        (4, "Database Security Best Practices",
         np.float32("1.4766761"), 7),
        (12, "Database Indexing Strategies",
         np.float32("1.4766761"), 6),
        (1, "Understanding PostgreSQL",
         np.float32("1.3164903"), 6)]


def test_plain_left_join_with_score(blog, spark):
    aidx, articles, comments = blog
    authors = spark.createDataFrame(AUTHORS, "id long, name string")
    a = _scored(aidx, articles, "technology")
    rows = (a.join(F.broadcast(authors.withColumnRenamed("id", "auid")),
                   a["author_id"] == F.col("auid"), "left")
            .orderBy(F.col("score").desc()).limit(5)
            .select("id", "title", "score", "name").collect())
    assert [(r[0], r[1], np.float32(r[2]), r[3]) for r in rows] == [
        (11, "Computer Vision Applications", np.float32("2.2999182"),
         "Jane Smith")]


def test_lateral_multi_aggregates(blog):
    aidx, articles, comments = blog
    a = _scored(aidx, articles, "machine learning")
    stats = (comments.groupBy("article_id")
             .agg(F.count("*").alias("total_comments"),
                  F.round(F.avg("rating"), 2).alias("avg_rating")))
    rows = (a.join(stats, a["id"] == stats["article_id"], "left")
            .orderBy(F.col("score").desc()).limit(10)
            .select("id", "title", "total_comments", "avg_rating")
            .collect())
    assert [(r[0], r[1], r[2], float(r[3])) for r in rows] == [
        (2, "Machine Learning Basics", 7, 2.00)]
