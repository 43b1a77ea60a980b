"""issue_4146.out golden (PUBLIC reference behavior, corpus replicated
from the reference's common/docs_setup.sql formulas): a three-table
join (documents ⋈ files ⋈ pages) under a ParadeDB Join Scan with

- a cross-table numeric range (pages.sizeInBytes > 5000),
- a heap LIKE prefix filter on the driving side (d.parents LIKE 'SFR%')
  composed with an indexed pdb.all() via heap_filter,
- SELECT DISTINCT + ORDER BY d.title ASC LIMIT 50 (the reference plan
  adds the remaining distinct columns as tiebreak sort keys).

The docs_setup corpus is deterministic md5 arithmetic — documents/files
125 rows each, pages 1000 — so the 12 result rows the reference pins
are replicated here byte-for-byte from the same formulas.

Ref: pg_search/tests/pg_regress/expected/issue_4146.out
     pg_search/tests/pg_regress/sql/common/docs_setup.sql
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

ROWS = 1000
N_DOCS = (ROWS + 7) // 8  # ceil(rows / 8.0) = 125


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _uuid_text(i: int) -> str:
    """docs_setup.sql uuid_text(): LPAD(i,10,'0') repeated to 32 hex
    chars, rendered as a uuid string."""
    t = str(i).zfill(10)
    h = (t * 4)[:32]
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


def _documents():
    out = []
    for i in range(1, N_DOCS + 1):
        if i % 10 == 0:
            parents = "SFR " + _md5(f"documents:parents:sfr:{i}")[:20]
        elif i % 10 == 1:
            parents = ("PROJECT_ALPHA "
                       + _md5(f"documents:parents:alpha:{i}")[:15])
        else:
            parents = (f"PARENT_GROUP_{(i * 37) % 200} "
                       + _md5(f"documents:parents:group:{i}")[:10])
        content = (
            "Document Content Chunk 1: " + _md5(f"documents:content:a:{i}")
            + "\nDocument Content Chunk 2: "
            + _md5(f"documents:content:b:{i}")
            + f"\nEnd of Document Content. ID: {(i * 1543) % 100000}")
        title = (f"Document Title {(i * 97) % 50000} - "
                 + _md5(f"documents:title:{i}")[:25])
        out.append((_uuid_text(i), parents, content, title))
    return out


def _files():
    out = []
    for i in range(1, N_DOCS + 1):
        doc = _uuid_text(1 + ((i * 17) % N_DOCS))
        out.append((_uuid_text(i), doc, (i * 173) % 10000))
    return out


def _pages():
    out = []
    for i in range(1, ROWS + 1):
        fid = _uuid_text(1 + ((i * 19) % N_DOCS))
        out.append((_uuid_text(i), fid, (i * 223) % 10000))
    return out


# the reference's pinned result page (issue_4146.out, 12 rows) in its
# ORDER BY d.title ASC order
EXPECTED = [
    ("00000001-1000-0000-0110-000000011000",
     "Document Title 10670 - d4af2d263e57f8d5fb92df991",
     "SFR 615ee94d40192144e7fd"),
    ("00000001-2000-0000-0120-000000012000",
     "Document Title 11640 - 5c266e5ecfb83538f5063008d",
     "SFR c20f634e56695f50144f"),
    ("00000000-2000-0000-0020-000000002000",
     "Document Title 1940 - 57bc42f0247557833b16db64f",
     "SFR 34438b9d2712a7525427"),
    ("00000000-3000-0000-0030-000000003000",
     "Document Title 2910 - 5e17c4063599eb645ef89ba2f",
     "SFR 02b88f4cf0c6b40c7e7e"),
    ("00000000-4000-0000-0040-000000004000",
     "Document Title 3880 - 4fc66b4420dedd33a5b96077a",
     "SFR a63b75c26076f43ad6f3"),
    ("00000000-5000-0000-0050-000000005000",
     "Document Title 4850 - 7e1a833bd6445b37c021fd680",
     "SFR 90411dcb4ae9eb74ae9e"),
    ("00000000-6000-0000-0060-000000006000",
     "Document Title 5820 - 811f39bde701dd9200973a575",
     "SFR d998df961e537c6b1d88"),
    ("00000000-7000-0000-0070-000000007000",
     "Document Title 6790 - bc04742fa17e5b12781d7b2bf",
     "SFR 6ad53ea3e0abd6be311a"),
    ("00000000-8000-0000-0080-000000008000",
     "Document Title 7760 - 6e31ca7e4faff574d05f97e0b",
     "SFR 332388843a0785881aa5"),
    ("00000000-9000-0000-0090-000000009000",
     "Document Title 8730 - c954d8aca311699ec6ef73a3e",
     "SFR 1beeeb5f00d77c6b454f"),
    ("00000000-1000-0000-0010-000000001000",
     "Document Title 970 - a4ad3549e3406ccee24bd0350",
     "SFR 61ab3bf787356c374a16"),
    ("00000001-0000-0000-0100-000000010000",
     "Document Title 9700 - e37e198c4960cda7e120ade89",
     "SFR 05afeab30f0d04234a5e"),
]


def test_corpus_formulas_match_reference():
    """The python replication of docs_setup.sql reproduces the exact
    uuid/md5 values the reference result page pins."""
    docs = {d[0]: d for d in _documents()}
    for uid, title, parents in EXPECTED:
        assert uid in docs
        assert docs[uid][3] == title
        assert docs[uid][1] == parents


@pytest.fixture(scope="module")
def fx(spark):
    documents = spark.createDataFrame(
        _documents(), "id string, parents string, content string, "
                      "title string")
    files = spark.createDataFrame(
        _files(), "id string, documentId string, sizeInBytes long")
    pages = spark.createDataFrame(
        _pages(), "id string, fileId string, sizeInBytes long")
    d_idx = build_index(documents, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="content"),
                     FieldConfig(name="title"),
                     FieldConfig(name="parents")]))
    return documents, files, pages, d_idx


def test_distinct_three_table_join_topk(fx):
    """SELECT DISTINCT d.id, d.title, d.parents ... ORDER BY d.title
    LIMIT 50 — heap LIKE prefix composed with indexed all()."""
    documents, files, pages, d_idx = fx
    m = compile_query(d_idx, ast.All()).select(
        F.col("doc_id").alias("d_k"))
    got = (documents.alias("d")
           .join(m, F.col("d.id") == F.col("d_k"))
           .filter(F.col("d.parents").startswith("SFR"))
           .join(files.alias("f"),
                 F.col("d.id") == F.col("f.documentId"))
           .join(pages.alias("p"), F.col("f.id") == F.col("p.fileId"))
           .filter(F.col("p.sizeInBytes") > 5000)
           .select("d.id", "d.title", "d.parents")
           .distinct()
           .orderBy(F.col("title").asc(), F.col("id").asc(),
                    F.col("parents").asc())
           .limit(50)
           .collect())
    assert [(r.id, r.title, r.parents) for r in got] == EXPECTED
