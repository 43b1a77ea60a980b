"""API surface + windowed TF aggregate tests."""

import pytest
from pyspark.sql import functions as F

from sparksearch.api import (tokenize, tokenizers, index_fields, index_info,
                             index_segments, storage_info)
from sparksearch.fixtures import transcripts, transcripts_pdf, TRANSCRIPTS_SCHEMA
from sparksearch.schema import FieldConfig
from sparksearch.streaming.windows import (term_frequency_windows,
                                           top_terms_per_window)
from sparksearch.analysis import py_tokenize


def test_tokenize_api(spark):
    rows = tokenize(spark, "default", "Hello, World! 42").collect()
    assert [(r["token"], r["position"]) for r in rows] == \
        [("hello", 0), ("world", 1), ("42", 2)]
    rows = tokenize(spark, "ngram", "abc", min_gram=2, max_gram=2).collect()
    assert [r["token"] for r in rows] == ["ab", "bc"]
    assert "default" in tokenizers() and "edge_ngram" in tokenizers()


def test_index_introspection(mock_index):
    info = index_info(mock_index)
    assert info["key_field"] == "id"
    assert info["fields"]["description"]["num_docs"] == 41
    assert info["fields"]["description"]["avg_len"] == 3.0
    assert info["fields"]["description"]["distinct_terms"] > 50
    fields = index_fields(mock_index)
    assert {f["name"] for f in fields} == {"description", "category", "metadata"}


def test_segment_introspection(spark, tmp_path):
    from sparksearch.streaming import StreamingIndexer
    from sparksearch.schema import IndexSchema
    pdf = transcripts_pdf(5, seed=9)
    docs = spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA).withColumn(
        "doc_id", F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string")))
    schema = IndexSchema(key_field="doc_id", text_fields=[FieldConfig(name="text")])
    ix = StreamingIndexer(schema, str(tmp_path / "idx"), str(tmp_path / "ck"))
    ix.sink_batch(docs, 0)
    ix.sink_batch(docs.limit(10), 1)
    segs = index_segments(str(tmp_path / "idx"))
    assert len(segs) == 2 and all(s["committed"] for s in segs)
    assert segs[0]["n_docs"] == len(pdf)
    sizes = storage_info(str(tmp_path / "idx"))
    assert all(v > 0 for v in sizes.values())


def test_tumbling_tf_windows(spark):
    df = transcripts(spark, n_convs=6, seed=17, late_fraction=0.0)
    got = term_frequency_windows(df, FieldConfig(name="text"),
                                 window="10 minutes")
    rows = got.collect()
    # oracle: recompute from pandas
    pdf = transcripts_pdf(6, seed=17, late_fraction=0.0)
    want = {}
    for _, r in pdf.iterrows():
        start = r["ts"].floor("10min")
        for t in py_tokenize(r["text"]):
            want[(start, t)] = want.get((start, t), 0) + 1
    got_map = {(r["window_start"], r["term"]): r["tf"] for r in rows}
    assert got_map == want


def test_sliding_tf_windows_and_topk(spark):
    df = transcripts(spark, n_convs=4, seed=19, late_fraction=0.0)
    sl = term_frequency_windows(df, FieldConfig(name="text"),
                                window="10 minutes", slide="5 minutes")
    rows = sl.collect()
    # every event lands in exactly 2 sliding windows → Σ tf doubles
    tumb = term_frequency_windows(df, FieldConfig(name="text"),
                                  window="10 minutes")
    assert (sum(r["tf"] for r in rows)
            == 2 * sum(r["tf"] for r in tumb.collect()))
    top = top_terms_per_window(sl, k=3).collect()
    by_w = {}
    for r in top:
        by_w.setdefault(r["window_start"], []).append(r["tf"])
    assert all(len(v) <= 3 and v == sorted(v, reverse=True)
               for v in by_w.values())


def test_streaming_tf_windows(spark, tmp_path):
    """The same windowed agg as a real stream with watermark."""
    import glob, os, shutil
    pdf = transcripts_pdf(6, seed=17, late_fraction=0.0).sort_values("ts")
    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA).coalesce(1) \
        .write.mode("overwrite").parquet(str(tmp_path / "w"))
    shutil.copy(glob.glob(str(tmp_path / "w/*.parquet"))[0], f"{src}/a.parquet")
    stream = (spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(src)
              .withWatermark("ts", "1 hour"))
    out = term_frequency_windows(stream, FieldConfig(name="text"),
                                 window="10 minutes")
    q = (out.writeStream.outputMode("complete").format("memory")
         .queryName("tfw").option("checkpointLocation", str(tmp_path / "ck"))
         .start())
    q.processAllAvailable()
    q.stop()
    got = {(r["window_start"], r["term"]): r["tf"]
           for r in spark.sql("SELECT * FROM tfw").collect()}
    want = {(r["window_start"], r["term"]): r["tf"]
            for r in term_frequency_windows(
                spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA),
                FieldConfig(name="text"), window="10 minutes").collect()}
    assert got == want


def test_admin_verification_family(spark, tmp_path, mock_index):
    """verify_index / validate_checksum / merge_info / layer_sizes
    (reference api/admin.rs family)."""
    from sparksearch.api import (verify_index, validate_checksum,
                                 merge_info, layer_sizes)
    from sparksearch.streaming import StreamingIndexer
    from sparksearch.streaming.indexer import compact_segments
    from sparksearch.schema import IndexSchema

    # verify_index over a healthy batch index
    rep = verify_index(mock_index)
    assert rep["ok"], rep

    # streamed segments → checksum + merge info
    pdf = transcripts_pdf(6, seed=11)
    docs = spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA).withColumn(
        "doc_id", F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string")))
    schema = IndexSchema(key_field="doc_id", text_fields=[FieldConfig(name="text")])
    idx_path = str(tmp_path / "idx")
    ix = StreamingIndexer(schema, idx_path, str(tmp_path / "ck"))
    ix.sink_batch(docs, 0)
    ix.sink_batch(docs.limit(20), 1)
    cs = validate_checksum(spark, idx_path)
    assert cs["ok"], cs

    mi = merge_info(idx_path, layer_sizes=[64 * 1024 * 1024])
    assert set(mi) == {"live", "retired", "generation", "candidates"}
    assert len(mi["live"]) == 2
    ls = layer_sizes(idx_path)
    assert len(ls) == 2 and all(x["bytes"] > 0 for x in ls)

    # corrupt a segment's stored hash → checksum must fail
    import json as _json
    seg0 = f"{idx_path}/segments/epoch=0"
    with open(f"{seg0}/stats.json") as fh:
        st = _json.load(fh)
    st["content_hash"] = st["content_hash"] ^ 1
    with open(f"{seg0}/stats.json", "w") as fh:
        _json.dump(st, fh)
    assert not validate_checksum(spark, idx_path)["ok"]
    # restore and compact → retired set appears in merge_info
    st["content_hash"] = st["content_hash"] ^ 1
    with open(f"{seg0}/stats.json", "w") as fh:
        _json.dump(st, fh)
    compact_segments(spark, idx_path, schema)
    mi2 = merge_info(idx_path)
    assert len(mi2["live"]) == 1 and len(mi2["retired"]) == 2
    assert validate_checksum(spark, idx_path)["ok"]


def test_engine_config_gucs(mock_index):
    """GUC-analog config surface (reference gucs.rs): knobs are read at
    call time and unknown keys are rejected."""
    import sparksearch.config as cfg
    import pytest as _pytest
    from sparksearch.query.compiler import _max_expansions
    from sparksearch.index import adaptive_buckets
    assert _max_expansions() == 50
    cfg.set(max_expansions=7, n_term_buckets=16)
    try:
        assert _max_expansions() == 7
        assert adaptive_buckets(10**9) == 16
    finally:
        cfg.set(max_expansions=50, n_term_buckets=64)
    with _pytest.raises(KeyError):
        cfg.set(nonexistent_knob=1)
