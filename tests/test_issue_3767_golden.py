"""issue_3767.out golden (PUBLIC reference behavior): term search over
a varchar[] ARRAY field with constant target-list expressions — a
15k-row corpus where '{Brian Griffin}' appears exactly twice (rows 1
and 14208 by construction); ``author @@@ pdb.term('brian')`` returns
those two keys stably across repeated executions, with literal / 2+2 /
NULL projections alongside.

Ref: pg_search/tests/pg_regress/expected/issue_3767.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

AUTHORS = [("Brian Griffin", 1), ("Tricia Takanawa", 670),
           ("Stewie Griffin", 618), ("God", 622), ("Horace", 703),
           ("Tom Tucker", 653), ("Mayor Adam West", 586),
           ("Bonnie Swanson", 633), ("Diane Simmons", 663),
           ("Joe Swanson", 683), ("Fouad", 674), ("Evil Monkey", 628),
           ("Chris Griffin", 666), ("Joyce Kinney", 579),
           ("James Woods", 621), ("Principal Shephard", 622),
           ("Karen Griffin", 680), ("Meg Griffin", 657), ("Carl", 613),
           ("Mort Goldman", 679), ("Glenn Quagmire", 675),
           ("Barabara Pewterschmidt", 654), ("Mickey McFinnigan", 627),
           ("Brian Griffin", 1), ("Peter Griffin", 618),
           ("Consuela", 670), ("Thelma Griffin", 642),
           ("Lois Griffin", 617), ("Cleveland Brown", 637),
           ("Carter Pewterschmidt", 634), ("Ollie Williams", 617)]


@pytest.fixture(scope="module")
def core(spark):
    rows, doid = [], 0
    for author, ct in AUTHORS:
        for _ in range(ct):
            doid += 1
            rows.append((doid, [author]))
    docs = spark.createDataFrame(rows,
                                 "dwf_doid long, author array<string>")
    idx = build_index(docs, IndexSchema(
        key_field="dwf_doid",
        text_fields=[FieldConfig(name="author")]))
    return idx, docs


def test_term_over_array_field_stable(core):
    idx, docs = core
    # the golden repeats the query with sleeps to chase a visibility
    # bug; the invariant is stability across executions
    for _ in range(3):
        got = sorted(r["doc_id"] for r in
                     compile_query(idx,
                                   ast.Term("author", "brian")).collect())
        assert got == [1, 14208]


def test_constant_projections(core):
    idx, docs = core
    m = compile_query(idx, ast.Term("author", "brian")).select("doc_id")
    out = (docs.join(m, docs["dwf_doid"] == m["doc_id"], "left_semi")
           .select("dwf_doid", F.lit("1").alias("c1"),
                   (F.lit(2) + F.lit(2)).alias("c2"),
                   F.lit(None).cast("string").alias("c3"))
           .orderBy("dwf_doid").collect())
    assert [(r["dwf_doid"], r["c1"], r["c2"], r["c3"]) for r in out] == \
        [(1, "1", 4, None), (14208, "1", 4, None)]
