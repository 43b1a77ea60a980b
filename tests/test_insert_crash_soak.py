"""Kill-mid-insert soaks for the newest exactly-once surfaces (round-4
verdict ask #4): SIGKILL the writer BETWEEN the two parquet writes of an
epoch-keyed insert — (a) SigIndex.insert (buckets written, sigs not) and
(b) PqIndex.insert (codes written, vectors not) — then assert a reader
over the crashed layout stays consistent (no duplicates, no exception)
and a same-epoch re-insert converges on the never-crashed result.  The
epoch-keyed overwrite-per-segment layout is what makes this provable:
the retry rewrites exactly the torn segment and nothing else.
"""

import subprocess
import sys

import pytest
from pyspark.sql import functions as F

TESTDOCS = "/root/testdata/sf0.001/documents.parquet"

_CHILD = '''
import os, signal, sys
sys.path.insert(0, "/root/repo")
kind, path, kill_marker = sys.argv[1], sys.argv[2], sys.argv[3]

# SIGKILL the moment the FIRST write of the epoch segment completes —
# the second table of the pair is never written (the torn-insert window)
import pyspark.sql.readwriter as rw
_orig = rw.DataFrameWriter.parquet
def _boom(self, p, *a, **kw):
    r = _orig(self, p, *a, **kw)
    if kill_marker in p:
        os.kill(os.getpid(), signal.SIGKILL)
    return r
rw.DataFrameWriter.parquet = _boom

from sparksearch.session import get_spark
spark = get_spark(app_name="insert-crash-child", cores=4,
                  shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")

if kind == "sig":
    from sparksearch.pipeline.dedup import load_sig_index
    docs = (spark.read.parquet("%s")
            .select("doc_id", "text").filter("doc_id %% 2 = 1").limit(40))
    load_sig_index(spark, path).insert(docs, "doc_id", epoch="e9")
else:
    from sparksearch.pipeline.similarity import load_pq_index
    emb = spark.read.parquet(path + "__newrows")
    load_pq_index(spark, path).insert(emb, "vec_id", "embedding",
                                      epoch_id=9)
print("NO_CRASH")  # reaching here means the kill hook never fired
''' % TESTDOCS


def _run_child(kind: str, path: str, kill_marker: str):
    child = subprocess.run([sys.executable, "-c", _CHILD,
                            kind, path, kill_marker],
                           capture_output=True, text=True, timeout=300)
    assert child.returncode != 0, child.stdout
    assert "NO_CRASH" not in child.stdout
    return child


@pytest.fixture(scope="module")
def embeddings(spark):
    import random
    rng = random.Random(77)
    rows = []
    base = [rng.gauss(0, 1) for _ in range(16)]
    for i in range(60):
        if i % 10 == 0:
            v = [x + rng.gauss(0, 0.01) for x in base]
        else:
            v = [rng.gauss(0, 1) for _ in range(16)]
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "vec_id int, embedding array<float>").cache()


def test_sig_index_kill_mid_insert_epoch(spark, tmp_path):
    from sparksearch.pipeline.dedup import build_sig_index, load_sig_index
    docs = spark.read.parquet(TESTDOCS).select("doc_id", "text")
    corpus = docs.filter("doc_id % 2 = 0")
    batch = docs.filter("doc_id % 2 = 1").limit(40)
    probe = docs.filter("doc_id % 2 = 1").limit(80).subtract(batch) \
        .limit(20)

    path = str(tmp_path / "sig_crash")
    build_sig_index(corpus, "doc_id", path)
    ref_path = str(tmp_path / "sig_ref")
    ref = build_sig_index(corpus, "doc_id", ref_path)
    ref.insert(batch, "doc_id", epoch="e9")

    _run_child("sig", path, "/buckets/seg=e9")

    # (a) crashed layout: buckets/seg=e9 exists, sigs/seg=e9 does not —
    # a reader must stay consistent: candidates without a stored sig
    # drop out of the verification join; no duplicates, no error
    idx = load_sig_index(spark, path)
    crashed = idx.near_duplicates_of(probe, "doc_id").collect()
    keys = [(r["a"], r["b"]) for r in crashed]
    assert len(keys) == len(set(keys)), "duplicate pairs after crash"

    # (b) same-epoch retry overwrites the torn segment; results equal
    # the never-crashed twin exactly
    idx.insert(batch, "doc_id", epoch="e9")
    got = sorted((r["a"], r["b"], round(r["est_jaccard"], 9))
                 for r in idx.near_duplicates_of(probe, "doc_id")
                 .collect())
    want = sorted((r["a"], r["b"], round(r["est_jaccard"], 9))
                  for r in ref.near_duplicates_of(probe, "doc_id")
                  .collect())
    assert got == want
    # the bucket store itself carries no duplicate (band, bh, id) rows
    dups = (idx.buckets().groupBy("band", "bh", "id").count()
            .filter(F.col("count") > 1).count())
    assert dups == 0


def test_pq_index_kill_mid_insert_epoch(spark, tmp_path, embeddings):
    from sparksearch.pipeline.similarity import (build_pq_index,
                                                 load_pq_index)
    first = embeddings.filter("vec_id < 40")
    rest = embeddings.filter("vec_id >= 40")
    q = embeddings.filter("vec_id = 0").first()["embedding"]

    path = str(tmp_path / "pq_crash")
    build_pq_index(first, "vec_id", "embedding", path,
                   m=4, k_codes=8, seed=11, coarse_clusters=4)
    rest.write.mode("overwrite").parquet(path + "__newrows")
    ref_path = str(tmp_path / "pq_ref")
    ref = build_pq_index(first, "vec_id", "embedding", ref_path,
                         m=4, k_codes=8, seed=11, coarse_clusters=4)
    ref.insert(rest, "vec_id", "embedding", epoch_id=9)

    _run_child("pq", path, "/codes/seg=e9")

    # (a) crashed layout: codes/seg=e9 exists, vectors/seg=e9 does not.
    # ADC candidates from the torn segment lack a rerank vector — the
    # late-materialization join drops them; no duplicate ids, no error
    idx = load_pq_index(spark, path)
    got_crashed = [r["id"] for r in idx.topk(q, k=10, rerank=3).collect()]
    assert len(got_crashed) == len(set(got_crashed))

    # (b) same-epoch retry rewrites the torn segment; no duplicate codes
    # per id, and topk equals the never-crashed twin
    idx.insert(rest, "vec_id", "embedding", epoch_id=9)
    codes = spark.read.parquet(f"{path}/codes")
    dups = (codes.groupBy("id").count()
            .filter(F.col("count") > 1).count())
    assert dups == 0
    got = [(r["id"], round(r["dist"], 6))
           for r in idx.topk(q, k=10, rerank=3).collect()]
    want = [(r["id"], round(r["dist"], 6))
            for r in ref.topk(q, k=10, rerank=3).collect()]
    assert got == want
    assert idx.vector_info()["vector_num_vectors"] == 60
