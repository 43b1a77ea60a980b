"""issue_4665.out golden (PUBLIC reference behavior): prepared-plan
parity over a multi-segment index — ``content ||| $1 ORDER BY score
DESC LIMIT 10`` must return the same rows however the scan is
parallelized / parameterized.  10k docs over FOUR insert segments; all
'technology' docs tie on score, so the deterministic (score desc, id
asc) page is 6, 12, ..., 60 — the golden's CUSTOM-plan output (its
GENERIC output is a different valid tie-order from parallel workers;
the engine's tiebreak is total, so every mode returns the CUSTOM
page).  Re-executing with a different parameter re-plans correctly.

Ref: pg_search/tests/pg_regress/expected/issue_4665.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema
from sparksearch.query import ast
from sparksearch.query.search import search
from sparksearch.streaming.indexer import (_committed_segments,
                                           insert_docs,
                                           open_segmented_index)

TOPICS = ["technology", "science", "cooking", "sports", "music", "art"]


def _batch(spark, lo, hi):
    i = F.col("id")
    return spark.range(lo, hi + 1).select(
        # zero-padded so the string key's byte order IS the golden's
        # integer order (the engine keys segments by string doc_id)
        F.format_string("%05d", i).alias("doc_id"),
        F.concat(F.lit("document about "),
                 F.element_at(F.array(*[F.lit(t) for t in TOPICS]),
                              (i % 6 + 1).cast("int")),
                 F.lit(" with details on topic number "),
                 i.cast("string"),
                 F.lit(" covering various aspects")).alias("content"))


@pytest.fixture(scope="module")
def seg4(spark, tmp_path_factory):
    tdir = str(tmp_path_factory.mktemp("i4665"))
    schema = IndexSchema(key_field="doc_id",
                         text_fields=[FieldConfig(name="content")])
    docs = None
    for lo, hi in [(1, 2500), (2501, 5000), (5001, 7500), (7501, 10000)]:
        b = _batch(spark, lo, hi)
        insert_docs(spark, f"{tdir}/idx", b, schema)
        docs = b if docs is None else docs.unionByName(b)
    assert len(_committed_segments(f"{tdir}/idx")) == 4
    return open_segmented_index(spark, f"{tdir}/idx", schema, docs=docs)


def _page(idx, needle, limit):
    q = ast.Match("content", needle)   # ||| = match disjunction
    got = search(idx, q, limit=limit,
                 order_by=[("score", "desc"), ("doc_id", "asc")],
                 columns=["doc_id"]).collect()
    return [int(r["doc_id"]) for r in got]


def test_prepared_custom_and_generic_same_rows(seg4):
    want = [6, 12, 18, 24, 30, 36, 42, 48, 54, 60]
    # CUSTOM-mode execution
    assert _page(seg4, "technology", 10) == want
    # GENERIC-mode re-execution of the same prepared query: identical
    # rows (the issue was worker selection diverging between modes)
    assert _page(seg4, "technology", 10) == want


def test_parameterized_limit(seg4):
    assert _page(seg4, "technology", 10) == \
        [6, 12, 18, 24, 30, 36, 42, 48, 54, 60]
    assert _page(seg4, "technology", 3) == [6, 12, 18]


def test_reprepare_with_other_param(seg4):
    # 'science' docs are i % 6 == 1 → 1, 7, 13, ...
    assert _page(seg4, "science", 5) == [1, 7, 13, 19, 25]
