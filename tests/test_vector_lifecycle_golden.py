"""Vector index lifecycle goldens (PUBLIC reference behavior):

- vector_ingest.out — non-finite elements (NaN / ±Inf) are rejected at
  ingest with pgvector's error strings; finite vectors index and rank.
- vector_merge.out — cluster_replication writes each vector into its r
  nearest cells; vector_info counts DISTINCT docs as num_vectors while
  total_memberships counts posting rows; exhaustive probing returns
  every distinct doc exactly once (replicas deduped, nothing lost,
  nothing doubled).
- vector_delete_all_docs.out — deleting every vector-bearing doc leaves
  a valid empty vector field: ORDER BY returns zero rows with no error
  under exhaustive probing, and the text index still serves non-vector
  queries over the surviving docs.
- vector_mutable_segment.out — freshly ingested docs are immediately
  visible to a vector-ordered TopK over the index.
- vector_unsupported_types.out — only the three vector opclasses are
  accepted; pgvector's hnsw/ivfflat opclasses (halfvec_l2_ops, ...) are
  rejected at index declaration.

Ref: pg_search/tests/pg_regress/expected/vector_{ingest,merge,
delete_all_docs,mutable_segment,unsupported_types}.out
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.pipeline.similarity import (
    build_ivf_index, load_ivf_index, vector_order_search)
from sparksearch.query import ast


# ============================================================
# vector_ingest.out
# ============================================================

def test_nan_rejected(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, [float("nan"), 0.0, 0.0])], "id long, vec array<double>")
    with pytest.raises(ValueError, match="NaN not allowed in vector"):
        build_ivf_index(df, "id", "vec", str(tmp_path / "ivf"),
                        n_clusters=1)


def test_infinity_rejected(spark, tmp_path):
    df = spark.createDataFrame(
        [(2, [float("inf"), 0.0, 0.0])], "id long, vec array<double>")
    with pytest.raises(ValueError,
                       match="infinite value not allowed in vector"):
        build_ivf_index(df, "id", "vec", str(tmp_path / "ivf"),
                        n_clusters=1)


def test_finite_vectors_ingest_and_rank(spark, tmp_path):
    # Control: finite vectors ingest into the cosine index and are
    # searchable — the rejections above happened BEFORE indexing, not
    # inside a broken index (golden ids 3, 4).
    df = spark.createDataFrame(
        [(3, [1.0, 0.0, 0.0]), (4, [0.5, 0.5, 0.0])],
        "id long, vec array<double>")
    idx = build_ivf_index(df, "id", "vec", str(tmp_path / "ivf"),
                          n_clusters=1)
    got = [r["id"] for r in idx.topk([1.0, 0.0, 0.0], k=2,
                                     max_probe=1.0).collect()]
    assert got == [3, 4]


# ============================================================
# vector_merge.out — replication accounting + exhaustive dedup
# ============================================================

N_DOCS = 600


@pytest.fixture(scope="module")
def replicated(spark, tmp_path_factory):
    # the golden's deterministic corpus shape: 16-dim constant vectors
    # [g%89, ...], every vector replicated into its 3 nearest cells
    path = str(tmp_path_factory.mktemp("ivf") / "remerge")
    rows = [(g, [float(g % 89)] * 16) for g in range(1, N_DOCS + 1)]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    idx = build_ivf_index(df, "id", "vec", path, n_clusters=6,
                          cluster_replication=3)
    return idx


def test_num_vectors_is_distinct_docs(replicated):
    info = replicated.vector_info()
    assert info["vector_format"] == "ivf"
    assert info["vector_num_vectors"] == N_DOCS


def test_cluster_sizes_are_memberships(replicated):
    # per-cluster sizes deliberately stay memberships: their total
    # strictly exceeds the distinct-doc count under replication
    info = replicated.vector_info()
    assert info["vector_total_memberships"] == 3 * N_DOCS
    assert info["vector_total_memberships"] > info["vector_num_vectors"]


def test_exhaustive_probe_returns_each_doc_once(replicated):
    # max_probe=1.0 probes every cell and LIMIT widens past the corpus:
    # the replicated index must return every distinct row exactly once
    got = [r["id"] for r in
           replicated.topk([1.0] * 16, k=N_DOCS + 100,
                           max_probe=1.0).collect()]
    assert len(got) == N_DOCS
    assert len(set(got)) == N_DOCS


# ============================================================
# vector_delete_all_docs.out — empty vector field after deletes
# ============================================================

def test_delete_all_vector_docs(spark, tmp_path):
    # Interleave vector-bearing (odd id) and vector-less (even id) rows;
    # the vector field is optional per doc.
    n = 240
    rows = [(g, f"doc {g}",
             [float(g % 89)] * 16 if g % 2 == 1 else None)
            for g in range(1, n + 1)]
    df = spark.createDataFrame(rows,
                               "id long, label string, vec array<double>")
    path = str(tmp_path / "delvec")
    idx = build_ivf_index(df, "id", "vec", path, n_clusters=4)
    assert idx.vector_info()["vector_num_vectors"] == n // 2

    # Kill every vector-bearing doc.
    idx.delete([g for g in range(1, n + 1) if g % 2 == 1])

    # An IVF index now exists whose vector field is empty.
    info = idx.vector_info()
    assert info["vector_format"] == "ivf"
    assert info["vector_num_vectors"] == 0

    # Vector ORDER BY on the emptied field: no error, zero results,
    # under exhaustive probing so pruning can't explain the emptiness.
    assert idx.topk([1.0] * 16, k=n, max_probe=1.0).count() == 0

    # ...and reloading from disk sees the same tombstoned state
    assert load_ivf_index(spark, path).topk(
        [1.0] * 16, k=n, max_probe=1.0).count() == 0

    # The engine still serves non-vector queries after the vector
    # field is emptied (golden: live_docs keep answering) — the text
    # index over the same table is unaffected by vector tombstones.
    text_idx = build_index(df, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="label")]))
    from sparksearch.query.compiler import compile_query
    assert compile_query(text_idx, ast.Term("label", "doc")).count() == n


# ============================================================
# vector_mutable_segment.out — fresh ingest immediately rankable
# ============================================================

def test_fresh_ingest_vector_topk(spark):
    rows = [(1, "east", [1.0, 0.0, 0.0]), (2, "east2", [0.9, 0.0, 0.1]),
            (3, "north", [0.0, 1.0, 0.0]), (4, "up", [0.0, 0.0, 1.0]),
            (5, "mid", [0.7, 0.7, 0.0])]
    df = spark.createDataFrame(rows,
                               "id long, label string, vec array<double>")
    idx = build_index(df, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="label")],
        vector_fields={"vec": "vector_l2_ops"}))
    from sparksearch.api import index_info
    assert index_info(idx)["fields"]["label"]["num_docs"] == 5
    got = [r["id"] for r in
           vector_order_search(idx, ast.All(), df, [1.0, 0.0, 0.0],
                               vec_col="vec", op="<->", k=3).collect()]
    assert got == [1, 2, 5]


# ============================================================
# vector_unsupported_types.out — non-bm25 opclasses rejected
# ============================================================

@pytest.mark.parametrize("opclass", [
    "halfvec_l2_ops", "sparsevec_l2_ops", "bit_hamming_ops"])
def test_unsupported_opclasses_rejected(opclass):
    schema = IndexSchema(key_field="id",
                         text_fields=[FieldConfig(name="label")],
                         vector_fields={"vec": opclass})
    with pytest.raises(ValueError, match="unknown vector opclass"):
        schema.vector_opclass("vec")
