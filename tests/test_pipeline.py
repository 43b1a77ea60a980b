"""Training-data pipeline operator tests: dedup family, similarity search,
text analysis, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from sparksearch.pipeline import (
    exact_duplicates, minhash_near_duplicates, minhash_signatures,
    lsh_candidate_pairs, simhash64, simhash_near_duplicates,
    shingle_jaccard_pairs, embedding_near_duplicates, dedup_keep_first,
    cosine_topk, lsh_cosine_topk, language_id, quality_scores, token_counts,
    fingerprint64)


@pytest.fixture(scope="module")
def dup_docs(spark):
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away to the deep green forest")
    rows = [
        (0, base),
        (1, base),                                  # exact dup of 0
        (2, base.replace("quick", "rapid")),        # near dup of 0
        (3, base + " with a tiny extra suffix here"),  # near dup of 0
        (4, "completely different text about spark query engines and "
            "distributed joins across the cluster nodes tonight"),
        (5, "another unrelated document mentioning vectors embeddings and "
            "similarity search at massive scale for training data"),
        (6, "The  Quick Brown FOX jumps over the lazy dog and then runs far "
            "away to the deep green forest"),       # case/space variant
    ]
    return spark.createDataFrame(rows, "id int, text string").cache()


def test_exact_duplicates(dup_docs):
    groups = exact_duplicates(dup_docs, "id").collect()
    by_keep = {r["keep_id"]: r["n_dups"] for r in groups}
    assert by_keep[0] >= 2          # 0 and 1 identical (6 differs by spacing)
    total = sum(r["n_dups"] for r in groups)
    assert total == 7


def test_minhash_near_duplicates(dup_docs):
    pairs = {(r["a"], r["b"]): r["est_jaccard"]
             for r in minhash_near_duplicates(dup_docs, "id",
                                              threshold=0.5).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert any(a == 0 and b in (2, 3, 6) for a, b in pairs)
    assert not any({a, b} & {4, 5} and {a, b} - {4, 5} for a, b in pairs)


def test_minhash_agrees_with_exact_jaccard(dup_docs):
    exact = {(r["a"], r["b"]): r["jaccard"]
             for r in shingle_jaccard_pairs(dup_docs, "id",
                                            threshold=0.5).collect()}
    est = {(r["a"], r["b"]): r["est_jaccard"]
           for r in minhash_near_duplicates(dup_docs, "id",
                                            threshold=0.5).collect()}
    # every exact pair ≥ 0.7 is found by LSH, estimate within 0.25
    for pair, j in exact.items():
        if j >= 0.7:
            assert pair in est, f"LSH missed {pair} (jaccard {j})"
            assert abs(est[pair] - j) < 0.25


def test_lsh_bands_shapes(dup_docs):
    sigs = minhash_signatures(dup_docs, "id", n_hashes=64)
    assert len(sigs.first()["sig"]) == 64
    cands = lsh_candidate_pairs(sigs, bands=16)
    assert cands.columns == ["a", "b"]


def test_shingle_jaccard_max_df_binding(spark):
    """Round-6: the restructured df-cap path (anti-join vs the hot set
    + window-attached sizes + length-ratio prefilter) with a BINDING
    cap — pinned against a brute-force python computation of the same
    capped-Jaccard definition (df > max_df shingles dropped from both
    numerator and denominator)."""
    import itertools
    # 8 docs sharing one boilerplate phrase (its shingles go hot at
    # max_df=3) plus per-pair distinctive content
    boiler = "shared boilerplate header row alpha beta gamma"
    rows = [(i, f"{boiler} doc{i // 2} unique tail {'x' * (i % 2)} "
                f"padding words here now") for i in range(8)]
    docs = spark.createDataFrame(rows, "id int, text string")
    for max_df in (3, 100):
        got = {(r["a"], r["b"]): round(r["jaccard"], 6)
               for r in shingle_jaccard_pairs(
                   docs, "id", threshold=0.5, k=3,
                   max_df=max_df).collect()}
        # brute force with the identical definition
        def toks(t):
            import re
            return [w for w in re.split(r"[^\w]+", t.lower()) if w]
        def sh(t, k=3):
            ts = toks(t)
            if len(ts) < k:
                return {" ".join(ts)}
            return {" ".join(ts[i:i + k]) for i in range(len(ts) - k + 1)}
        sets = {i: sh(t) for i, t in rows}
        df = {}
        for s in itertools.chain.from_iterable(sets.values()):
            df[s] = sum(1 for v in sets.values() if s in v)
        informative = {i: {s for s in v if df[s] <= max_df}
                       for i, v in sets.items()}
        want = {}
        for a, b in itertools.combinations(sorted(sets), 2):
            ia, ib = informative[a], informative[b]
            union = len(ia | ib)
            if union == 0:
                continue
            j = len(ia & ib) / union
            if j >= 0.5:
                want[(a, b)] = round(j, 6)
        assert got == want, (max_df, got, want)
        if max_df == 3:
            # the cap must actually BIND on this corpus
            assert any(d > 3 for d in df.values())


def test_minhash_engine_parity(dup_docs, spark):
    """Round-6: the vectorized-numpy signature engine (default) is
    BIT-IDENTICAL to the JVM expression engine — same (a·h + b) mod p
    affine mins, element for element, including the no-shingle edge —
    on both the fixture docs and a real corpus slice."""
    docs_big = (spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet")
        .select(F.col("doc_id").alias("id"), "text").limit(300))
    empty_edge = spark.createDataFrame(
        [(100, ""), (101, None), (102, "one two three four five")],
        "id long, text string")
    for frame in (dup_docs, docs_big, empty_edge):
        arrow = {r["id"]: r["sig"] for r in minhash_signatures(
            frame, "id", n_hashes=64, engine="arrow").collect()}
        expr = {r["id"]: r["sig"] for r in minhash_signatures(
            frame, "id", n_hashes=64, engine="expr").collect()}
        assert arrow == expr and len(arrow) == frame.count()


def test_simhash(dup_docs, spark):
    vals = {r["id"]: r["sh"] for r in
            dup_docs.select("id", simhash64(F.col("text")).alias("sh")).collect()}
    assert vals[0] == vals[1] == vals[6]    # token stream identical
    pairs = {(r["a"], r["b"]): r["hamming"]
             for r in simhash_near_duplicates(dup_docs, "id",
                                              max_hamming=6).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 0
    assert all(h <= 6 for h in pairs.values())


def test_dedup_keep_first(dup_docs):
    pairs = minhash_near_duplicates(dup_docs, "id", threshold=0.5)
    kept = dedup_keep_first(dup_docs, pairs, "id")
    ids = {r["id"] for r in kept.select("id").collect()}
    assert 0 in ids and 4 in ids and 5 in ids
    assert 1 not in ids


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_connected_components_shapes(spark):
    from sparksearch.pipeline import connected_components
    # chain 1-3, 2-3: keep_first keeps {1,2} (both non-b-side) but they
    # are one cluster; components must label all three with min id 1
    pairs = spark.createDataFrame([(1, 3), (2, 3), (10, 11), (11, 12),
                                   (12, 13), (20, 21)], "a long, b long")
    comp = {r["id"]: r["component"]
            for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10,
                    20: 20, 21: 20}


def test_connected_components_empty_and_string_keys(spark):
    from sparksearch.pipeline import connected_components
    empty = spark.createDataFrame([], "a long, b long")
    assert connected_components(empty).count() == 0
    sp = spark.createDataFrame([("x", "y"), ("y", "z")],
                               "a string, b string")
    comp = {r["id"]: r["component"]
            for r in connected_components(sp).collect()}
    assert comp == {"x": "x", "y": "x", "z": "x"}


def test_connected_components_matches_union_find(spark):
    from sparksearch.pipeline import connected_components
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = simhash_near_duplicates(docs, "doc_id", max_hamming=10)
    edges = [(r["a"], r["b"]) for r in pairs.collect()]
    assert len(edges) > 5  # the graph must be non-trivial for this test
    want = _union_find(edges)
    got = {r["id"]: r["component"]
           for r in connected_components(pairs).collect()}
    assert got == want


def _brute_spans(ta, tb, L):
    """All maximal shared token runs ≥ L between token lists ta/tb,
    1-based (a_start, b_start, length)."""
    out = set()
    for i in range(len(ta)):
        for j in range(len(tb)):
            if ta[i] != tb[j]:
                continue
            if i and j and ta[i - 1] == tb[j - 1]:
                continue  # not maximal-left
            k = 0
            while (i + k < len(ta) and j + k < len(tb)
                   and ta[i + k] == tb[j + k]):
                k += 1
            if k >= L:
                out.add((i + 1, j + 1, k))
    return out


def test_shared_token_spans_exact(spark):
    from sparksearch.pipeline import shared_token_spans
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        # shares the full 10-token run with 1, embedded mid-doc
        (2, "x y alpha beta gamma delta epsilon zeta eta theta iota kappa z"),
        # shares two separate 4-token runs with 1 (split by a mismatch)
        (3, "alpha beta gamma delta MISMATCH zeta eta theta iota q r s"),
        (4, "totally unrelated words only here nothing shared at all"),
    ]
    docs = spark.createDataFrame(rows, "id long, text string")
    got = {(r["a"], r["b"]): set() for r in []}
    res = shared_token_spans(docs, "id", gram_len=4, max_df=None).collect()
    got = {}
    for r in res:
        got.setdefault((r["a"], r["b"]), set()).add(
            (r["a_start"], r["b_start"], r["length"]))
    texts = {i: t.lower().split() for i, t in rows}
    want = {}
    for ai in texts:
        for bi in texts:
            if ai < bi:
                s = _brute_spans(texts[ai], texts[bi], 4)
                if s:
                    want[(ai, bi)] = s
    assert got == want
    # the headline expectations, spelled out
    assert got[(1, 2)] == {(1, 3, 10)}
    assert got[(1, 3)] == {(1, 1, 4), (6, 6, 4)}
    assert (1, 4) not in got


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_shared_token_spans_fuzz(spark, seed):
    """Random shared-fragment corpora vs the brute-force span oracle."""
    import random
    from sparksearch.pipeline import shared_token_spans
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    frag = [rng.choice(vocab) for _ in range(rng.randint(6, 12))]
    rows = []
    for i in range(8):
        words = [rng.choice(vocab) for _ in range(rng.randint(10, 25))]
        if rng.random() < 0.6:  # plant the shared fragment somewhere
            at = rng.randint(0, len(words))
            words = words[:at] + frag + words[at:]
        rows.append((i, " ".join(words)))
    docs = spark.createDataFrame(rows, "id long, text string")
    res = shared_token_spans(docs, "id", gram_len=5, max_df=None).collect()
    got = {}
    for r in res:
        got.setdefault((r["a"], r["b"]), set()).add(
            (r["a_start"], r["b_start"], r["length"]))
    texts = {i: t.split() for i, t in rows}
    want = {}
    for ai in texts:
        for bi in texts:
            if ai < bi:
                s = _brute_spans(texts[ai], texts[bi], 5)
                if s:
                    want[(ai, bi)] = s
    assert got == want


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_connected_components_random_graphs(spark, seed):
    """Differential fuzz vs union-find: random graphs mixing isolated
    pairs, chains, cliques, hubs, duplicate and reversed edges."""
    import random
    from sparksearch.pipeline import connected_components
    rng = random.Random(seed)
    n = rng.randint(30, 120)
    edges = []
    for _ in range(rng.randint(20, 150)):
        a, b = rng.randrange(n), rng.randrange(n)
        edges.append((a, b))
        if rng.random() < 0.3:
            edges.append((b, a))  # reversed duplicate
    hub = rng.randrange(n)
    for _ in range(rng.randint(0, 20)):
        edges.append((hub, rng.randrange(n)))  # power-law-ish hub
    pairs = spark.createDataFrame(edges, "a long, b long")
    got = {r["id"]: r["component"]
           for r in connected_components(pairs).collect()}
    want = _union_find([(a, b) for a, b in edges if a != b])
    assert got == want


def test_dedup_canonical_one_per_cluster(spark):
    from sparksearch.pipeline import dedup_canonical, duplicate_groups
    docs = spark.createDataFrame([(i, f"t{i}") for i in range(1, 25)],
                                 "id long, text string")
    pairs = spark.createDataFrame([(1, 3), (2, 3), (10, 11), (11, 12)],
                                  "a long, b long")
    kept = {r["id"] for r in dedup_canonical(docs, pairs, "id").collect()}
    # exactly one survivor per cluster ({1,2,3} -> 1, {10,11,12} -> 10),
    # untouched docs all survive
    assert kept == set(range(1, 25)) - {2, 3, 11, 12}
    groups = duplicate_groups(pairs).collect()
    sizes = {r["component"]: r["group_size"] for r in groups}
    assert sizes == {1: 3, 10: 3}
    assert len(groups) == 6


@pytest.fixture(scope="module")
def embeddings(spark):
    import random
    rng = random.Random(77)
    rows = []
    base = [rng.gauss(0, 1) for _ in range(16)]
    for i in range(60):
        if i % 10 == 0:  # clones of base + tiny noise → near-dups
            v = [x + rng.gauss(0, 0.01) for x in base]
        else:
            v = [rng.gauss(0, 1) for _ in range(16)]
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>").cache()


def test_sig_index_incremental_dedup(spark, tmp_path):
    """Probing a persisted signature index with a new batch finds the
    SAME cross-set pairs as running the full batch LSH dedup, the probe
    plan prunes to the batch's tb partitions, and re-inserting an epoch
    is idempotent."""
    from sparksearch.pipeline import (build_sig_index, load_sig_index,
                                      minhash_near_duplicates)
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    newb = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "sig_idx")
    build_sig_index(corpus, "doc_id", path, n_buckets=16)
    idx = load_sig_index(spark, path)
    got = {(r["a"], r["b"]): r["est_jaccard"]
           for r in idx.near_duplicates_of(newb, "doc_id",
                                           threshold=0.7).collect()}
    # batch twin: full-corpus LSH pairs restricted to odd-even pairs,
    # reoriented to (new, corpus)
    full = minhash_near_duplicates(docs, "doc_id", threshold=0.7).collect()
    want = {}
    for r in full:
        a, b = r["a"], r["b"]
        if a % 2 != b % 2:
            na, nb = (a, b) if a % 2 == 1 else (b, a)
            want[(na, nb)] = r["est_jaccard"]
    assert got == want and len(got) > 0
    # replayed insert epoch: same segment overwritten, results unchanged
    idx.insert(corpus.limit(50), "doc_id", epoch="e1")
    idx.insert(corpus.limit(50), "doc_id", epoch="e1")
    got2 = {(r["a"], r["b"]): r["est_jaccard"]
            for r in idx.near_duplicates_of(newb, "doc_id",
                                            threshold=0.7).collect()}
    assert got2 == want
    # layout really is hive-partitioned by (band, tb)
    import glob as _g
    assert _g.glob(f"{path}/buckets/seg=b0/band=0/tb=*"), "missing tb dirs"
    # the base segment's epoch name is reserved: accepting it would
    # silently overwrite the original corpus (ADVICE r4)
    with pytest.raises(ValueError, match="b0"):
        idx.insert(newb, "doc_id", epoch="b0")


def test_semantic_dedup_collapses_clones(spark, embeddings):
    from sparksearch.pipeline import semantic_dedup, semantic_duplicate_pairs
    # the fixture plants 6 clones of one base vector (i % 10 == 0) at
    # cosine ≈ 1; they must all pair within one k-means cluster and
    # collapse to the single minimum id
    clones = {0, 10, 20, 30, 40, 50}
    pairs = semantic_duplicate_pairs(embeddings, "vec_id", "embedding",
                                     n_clusters=4, eps=0.05)
    got_pairs = {(r["a"], r["b"]) for r in pairs.collect()}
    assert got_pairs == {(a, b) for a in clones for b in clones if a < b}
    kept = {r["vec_id"] for r in
            semantic_dedup(embeddings, "vec_id", "embedding", n_clusters=4,
                           eps=0.05).select("vec_id").collect()}
    assert kept == (set(range(60)) - clones) | {0}


def test_semantic_dedup_tiny_corpus_clamps(spark):
    from sparksearch.pipeline import semantic_dedup
    import random
    rng = random.Random(5)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(3)]
    tiny = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    # 3 docs < 16 clusters: must clamp, not raise in k-means seeding
    assert semantic_dedup(tiny, "vec_id", "embedding").count() == 3


def test_cosine_topk_and_lsh_recall(embeddings):
    q = embeddings.filter("vec_id = 0").first()["embedding"]
    exact = [r["id"] for r in cosine_topk(embeddings.filter("vec_id <> 0"),
                                          "vec_id", "embedding", q, 5).collect()]
    assert set(exact[:5]) >= {10, 20, 30, 40, 50} - set()  # the clone club
    approx = [r["id"] for r in
              lsh_cosine_topk(embeddings.filter("vec_id <> 0"), "vec_id",
                              "embedding", q, 5, n_planes=16, bands=4).collect()]
    # LSH must find most of the exact top-5 (same-sign near-identical vecs
    # share all bands with overwhelming probability)
    assert len(set(approx) & set(exact)) >= 4


def test_embedding_near_duplicates(embeddings):
    pairs = embedding_near_duplicates(embeddings, "vec_id", "embedding",
                                      threshold=0.99).collect()
    got = {(r["a"], r["b"]) for r in pairs}
    clones = {0, 10, 20, 30, 40, 50}
    expected = {(a, b) for a in clones for b in clones if a < b}
    assert got >= expected
    assert all(a in clones and b in clones for a, b in got)


def test_language_id(spark):
    rows = [(1, "the cat is in the house and it is warm"),
            (2, "der hund ist nicht in das haus und ich bin"),
            (3, "le chat est dans la maison et il est content"),
            (4, "el perro es un animal y no es el gato"),
            (5, "zxqv wvut plomk")]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {r["id"]: r["lang_pred"] for r in language_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "und"}


def test_quality_scores(spark):
    df = spark.createDataFrame(
        [(1, "the the the the"), (2, "Diverse texts, with 42 numbers!")],
        "id int, text string")
    rows = {r["id"]: r for r in quality_scores(df).collect()}
    assert rows[1]["distinct_token_ratio"] == 0.25
    assert rows[2]["digit_ratio"] > 0
    assert rows[2]["punct_ratio"] > 0
    assert rows[1]["stopword_ratio"] == 1.0


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "hello world, extraordinary!")],
                               "id int, text string")
    r = token_counts(df).first()
    assert r["ws_tokens"] == 3
    assert r["word_tokens"] == 3
    # hello(2) + world(2) + extraordinary(4) chunks + 2 punct = 10
    assert r["bpe_ish_tokens"] == 10


def test_fingerprint(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World"), (2, "hello world"), (3, "other text")],
        "id int, text string")
    got = {r["id"]: r["fp"] for r in
           df.select("id", fingerprint64(F.col("text")).alias("fp")).collect()}
    assert got[1] == got[2] != got[3]


def test_multimodal_plumbing(spark):
    from sparksearch.pipeline.multimodal import (
        synth_media, decode_images, extract_audio_features,
        sample_video_frames)
    media = synth_media(spark, n=24).cache()
    img = decode_images(media).collect()
    assert len(img) == 8
    # synth images are REAL PNGs → the pure-python codec decodes them
    assert all(r["decoded"] for r in img)
    assert all(len(r["embedding"]) == 16 and r["channels"] in (1, 3, 4)
               for r in img)
    # determinism: same bytes → same features
    img2 = decode_images(media).collect()
    assert {r["media_id"]: r["embedding"] for r in img} == \
           {r["media_id"]: r["embedding"] for r in img2}
    aud = extract_audio_features(media).collect()
    assert len(aud) == 8 and all(len(r["mfcc"]) == 13 for r in aud)
    assert all(r["decoded"] and r["sample_rate"] == 16000 for r in aud)
    frames = sample_video_frames(media).collect()
    assert frames and all(r["frame_bytes"] for r in frames)


def test_multimodal_real_decode_ground_truth(spark):
    """Decoded dimensions/features match the encoder inputs exactly; a
    non-decodable blob routes through the labeled fallback."""
    import numpy as np
    import pandas as pd
    from sparksearch.pipeline import codecs
    from sparksearch.pipeline.multimodal import (
        MEDIA_SCHEMA, decode_images, extract_audio_features)
    dark = np.zeros((10, 20, 3), dtype=np.uint8)
    light = np.full((6, 4, 1), 255, dtype=np.uint8)
    sr = 16000
    tone = 0.5 * np.sin(2 * np.pi * 440 * np.arange(8000) / sr)
    rows = [
        {"media_id": "dark", "kind": "image", "mime": "image/png",
         "bytes": codecs.encode_png(dark), "meta": {}},
        {"media_id": "light", "kind": "image", "mime": "image/png",
         "bytes": codecs.encode_png(light), "meta": {}},
        {"media_id": "junk", "kind": "image", "mime": "image/jpeg",
         "bytes": b"\xff\xd8 not really a jpeg", "meta": {}},
        {"media_id": "photo", "kind": "image", "mime": "image/jpeg",
         "bytes": codecs.encode_jpeg(
             np.full((24, 16, 3), 200, dtype=np.uint8)), "meta": {}},
        {"media_id": "tone", "kind": "audio", "mime": "audio/wav",
         "bytes": codecs.encode_wav(tone, sr), "meta": {}},
    ]
    media = spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA_SCHEMA)
    img = {r["media_id"]: r for r in decode_images(media).collect()}
    assert (img["dark"]["width"], img["dark"]["height"],
            img["dark"]["channels"]) == (20, 10, 3)
    assert img["dark"]["decoded"] and img["light"]["decoded"]
    assert not img["junk"]["decoded"]
    # real baseline JPEG decodes for real (pure-python T.81 decoder)
    assert img["photo"]["decoded"]
    assert (img["photo"]["width"], img["photo"]["height"],
            img["photo"]["channels"]) == (16, 24, 3)
    # flat 200-gray → embedding ≈ (200-127.5)/255 each, within quant err
    assert all(abs(e - (200 - 127.5) / 255) < 0.02
               for e in img["photo"]["embedding"])
    assert all(e == pytest.approx(-0.5) for e in img["dark"]["embedding"])
    assert all(e == pytest.approx(0.5) for e in img["light"]["embedding"])
    aud = {r["media_id"]: r for r in extract_audio_features(media).collect()}
    assert aud["tone"]["decoded"] and aud["tone"]["n_samples"] == 8000
    # compare against the MFCC of the decoded (16-bit-quantized) samples
    want = codecs.mfcc(codecs.decode_wav(codecs.encode_wav(tone, sr))[1], sr)
    assert aud["tone"]["mfcc"] == pytest.approx(want, rel=1e-5)


def test_jpeg_codec_roundtrip():
    """Pure-python baseline JPEG (ITU-T T.81): encode→decode round-trips
    within quantization error for RGB, grayscale, odd (non-multiple-of-8)
    dimensions, and restart intervals; non-baseline input raises."""
    import numpy as np
    from sparksearch.pipeline import codecs
    rng = np.random.RandomState(7)
    x = np.linspace(0, 255, 48)[None, :] * np.ones((32, 1))
    img = np.stack([x, x[::-1], np.full((32, 48), 128.0)], -1)
    img = np.clip(img + rng.randint(-10, 10, img.shape), 0, 255) \
        .astype(np.uint8)
    data = codecs.encode_jpeg(img)
    assert codecs.is_jpeg(data) and not codecs.is_png(data)
    dec = codecs.decode_jpeg(data)
    assert dec.shape == img.shape and dec.dtype == np.uint8
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 8

    # smooth content → near-lossless at the Annex K tables
    smooth = np.stack([np.linspace(40, 200, 64)[None, :]
                       * np.ones((40, 1))] * 3, -1).astype(np.uint8)
    sdec = codecs.decode_jpeg(codecs.encode_jpeg(smooth))
    assert np.abs(sdec.astype(int) - smooth.astype(int)).max() <= 2

    # grayscale + odd dims (35x23, forces edge-padded partial blocks)
    g = img[:35 % 32 + 20, :23, 0]
    gdec = codecs.decode_jpeg(codecs.encode_jpeg(g))
    assert gdec.shape == g.shape

    # restart intervals (DRI + RSTn markers) decode identically
    r = codecs.decode_jpeg(codecs.encode_jpeg(img, restart_interval=3))
    assert np.array_equal(r, dec)

    # truncated / non-jpeg input raises (fallback path upstream)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        codecs.decode_jpeg(b"\xff\xd8 not really a jpeg")
    with _pytest.raises(ValueError):
        codecs.decode_jpeg(b"GIF89a")


def test_jpeg_malformed_routes_to_fallback():
    """Truncated or bit-flipped JPEG bytes must route to the labeled
    fallback (return None from the decode dispatcher), never crash the
    Arrow UDF worker."""
    import random
    import numpy as np
    from sparksearch.pipeline.codecs import encode_jpeg
    from sparksearch.pipeline.multimodal import _decode_any_image
    good = encode_jpeg(np.full((16, 16, 3), 99, np.uint8))
    assert _decode_any_image(good) is not None
    for cut in (3, 20, 100, len(good) // 2, len(good) - 3):
        assert _decode_any_image(good[:cut]) is None, cut
    rng = random.Random(5)
    for _ in range(20):
        b = bytearray(good)
        for _ in range(6):
            b[rng.randrange(len(b))] = rng.randrange(256)
        _decode_any_image(bytes(b))  # any result is fine; raising is not


def test_ivf_index_build_probe_recall(spark, tmp_path, embeddings):
    """IVF index (reference clustered vector layout): build trains
    deterministic spherical k-means, vectors land in their nearest
    cluster, queries probe only the closest clusters via partition
    filters, and recall vs the exact top-k is high for the clone
    cluster; raising max_probe to 1.0 is exhaustive-exact."""
    from sparksearch.pipeline import (build_ivf_index, load_ivf_index,
                                      cosine_topk)
    path = str(tmp_path / "ivf")
    idx = build_ivf_index(embeddings, "vec_id", "embedding", path,
                          n_clusters=8, seed=7)
    q = embeddings.filter("vec_id = 0").first()["embedding"]
    exact = [r["id"] for r in cosine_topk(
        embeddings.filter("vec_id <> 0"), "vec_id", "embedding", q,
        5).collect()]
    # probe 2 of 8 clusters: the clone cluster (ids 10..50 near vec 0)
    # lives in ONE cluster, so recall of the exact top-5 is full
    got = [r["id"] for r in idx.topk(q, k=6, nprobe=2).collect()]
    assert set(exact) <= set(got) | {0}
    # partition pruning: the probed plan reads <= nprobe cluster dirs
    plan = idx.topk(q, k=5, nprobe=2)._jdf.queryExecution() \
              .executedPlan().toString()
    assert "cluster" in plan
    # max_probe=1.0 probes everything → exhaustive == exact
    all_got = [r["id"] for r in idx.topk(q, k=6, max_probe=1.0).collect()]
    assert [i for i in all_got if i != 0][:5] == exact
    # load round-trip
    idx2 = load_ivf_index(spark, path)
    assert idx2.centroids == idx.centroids
    assert [r["id"] for r in idx2.topk(q, k=6, nprobe=2).collect()] == got


def test_ivf_centroids_deterministic(embeddings):
    """Same ordered input → bit-identical centroids (the property the
    DuckDB oracle twin relies on)."""
    from sparksearch.pipeline import train_centroids
    rows = [r["embedding"] for r in
            embeddings.orderBy("vec_id").collect()]
    a = train_centroids(rows, 8, seed=7)
    b = train_centroids(rows, 8, seed=7)
    assert a == b
    c = train_centroids(rows, 8, seed=8)
    assert a != c


def test_pq_adc_topk_recall_and_rerank(spark, tmp_path, embeddings):
    """PQ (product quantization) ADC scan: codes are 8 ints per vector
    instead of 16 floats, distances estimated from per-query lookup
    tables; the clone cluster quantizes to the same codes as the query,
    so ADC recall of the exact top-5 is full here, and rerank returns
    EXACT distances (matches vector_topk on the same metric)."""
    from sparksearch.pipeline import build_pq_index, load_pq_index
    from sparksearch.pipeline.similarity import vector_topk
    path = str(tmp_path / "pq")
    idx = build_pq_index(embeddings.filter("vec_id <> 0"), "vec_id",
                         "embedding", path, m=8, k_codes=8, seed=11)
    q = embeddings.filter("vec_id = 0").first()["embedding"]
    exact = vector_topk(embeddings.filter("vec_id <> 0"), "embedding",
                        q, 5, metric="l2",
                        tiebreak=[F.col("vec_id").asc()]).collect()
    got = idx.topk(q, k=6).collect()
    assert {r["vec_id"] for r in exact} <= {r["id"] for r in got}
    # rerank: exact distances on the ADC candidates — equal to the
    # brute-force values for the ids both lists share
    rr = {r["id"]: r["dist"] for r in idx.topk(q, k=5, rerank=4).collect()}
    for r in exact:
        assert r["vec_id"] in rr
        assert abs(rr[r["vec_id"]] - r["dist"] ** 2) < 1e-9  # vector_topk
        # returns L2 distance; PQ rerank returns squared L2 — same order
    # load round-trip reproduces codebooks and results
    idx2 = load_pq_index(spark, path)
    assert idx2.books == idx.books
    assert [r["id"] for r in idx2.topk(q, k=6).collect()] == \
           [r["id"] for r in got]


def test_pq_codebooks_deterministic(embeddings):
    from sparksearch.pipeline import train_pq_codebooks
    rows = [list(map(float, r["embedding"])) for r in
            embeddings.orderBy("vec_id").collect()]
    a = train_pq_codebooks(rows, 4, 8, seed=11)
    b = train_pq_codebooks(rows, 4, 8, seed=11)
    assert a == b
    assert a != train_pq_codebooks(rows, 4, 8, seed=12)


@pytest.mark.parametrize("m,k,seed", [(4, 8, 11), (2, 4, 3),
                                      (8, 16, 77), (1, 32, 5)])
def test_pq_codes_match_python_twin(spark, embeddings, m, k, seed):
    """The codegen'd encoding expression and a straight numpy argmin
    assign identical codes (first-min tie-break both sides), across
    subspace geometries from m=1 (plain VQ) to m=8 (2-dim subspaces)."""
    import numpy as np
    from sparksearch.pipeline import train_pq_codebooks
    from sparksearch.pipeline.similarity import _pq_codes_expr
    rows = embeddings.orderBy("vec_id").collect()
    vecs = [list(map(float, r["embedding"])) for r in rows]
    books = train_pq_codebooks(vecs, m, k, seed=seed)
    got = {r["vec_id"]: list(r["codes"]) for r in embeddings.select(
        "vec_id", _pq_codes_expr(F.col("embedding").cast("array<double>"),
                                 books).alias("codes")).collect()}
    sub = 16 // m
    for r, v in zip(rows, vecs):
        want = []
        for s, book in enumerate(books):
            sv = np.array(v[s * sub:(s + 1) * sub])
            d2 = [((sv - np.array(c)) ** 2).sum() for c in book]
            want.append(int(np.argmin(d2)))
        assert got[r["vec_id"]] == want, r["vec_id"]


def test_ivf_pq_coarse_partition_pruning(spark, tmp_path, embeddings):
    """IVF-PQ composition: codes parquet-partitioned by coarse cell, a
    probe scans only nprobe cells (cluster filter visible in the plan),
    and the clone cluster survives the compression+pruning stack."""
    from sparksearch.pipeline import build_pq_index
    path = str(tmp_path / "ivfpq")
    idx = build_pq_index(embeddings.filter("vec_id <> 0"), "vec_id",
                         "embedding", path, m=4, k_codes=8, seed=11,
                         coarse_clusters=4, metric="cosine")
    q = embeddings.filter("vec_id = 0").first()["embedding"]
    got = [r["id"] for r in idx.topk(q, k=8, nprobe=1, rerank=3).collect()]
    assert {10, 20, 30, 40, 50} <= set(got)
    plan = idx.topk(q, k=5, nprobe=1)._jdf.queryExecution() \
              .executedPlan().toString()
    assert "cluster" in plan


def test_pq_rejects_indivisible_dim(embeddings):
    from sparksearch.pipeline import train_pq_codebooks
    rows = [list(map(float, r["embedding"])) for r in
            embeddings.limit(8).collect()]
    with pytest.raises(ValueError, match="not divisible"):
        train_pq_codebooks(rows, 5, 4, seed=1)


def test_pq_delete_tombstones_and_vector_info(spark, tmp_path, embeddings):
    """PQ index visibility parity with IvfIndex: tombstoned docs never
    surface (even in the exact-rerank path), vector_info counts live
    docs only."""
    from sparksearch.pipeline import build_pq_index
    path = str(tmp_path / "pq_del")
    idx = build_pq_index(embeddings.filter("vec_id <> 0"), "vec_id",
                         "embedding", path, m=4, k_codes=8, seed=11)
    q = embeddings.filter("vec_id = 0").first()["embedding"]
    before = [r["id"] for r in idx.topk(q, k=5).collect()]
    assert before
    idx.delete(before[:2])
    after = [r["id"] for r in idx.topk(q, k=5, rerank=3).collect()]
    assert not set(before[:2]) & set(after)
    info = idx.vector_info()
    assert info["vector_format"] == "pq"
    assert info["vector_num_vectors"] == 59 - 2
    assert info["m"] == 4 and info["k"] == 8


def test_vector_index_insert_appends(spark, tmp_path, embeddings):
    """aminsert analog on both vector indexes: rows inserted AFTER the
    build are encoded with the frozen centroids/codebooks, land in the
    partitioned layout, and are immediately searchable; old rows'
    assignments never shift."""
    from sparksearch.pipeline import build_ivf_index, build_pq_index
    first = embeddings.filter("vec_id <> 0 AND vec_id < 40")
    rest = embeddings.filter("vec_id >= 40")
    q = embeddings.filter("vec_id = 0").first()["embedding"]

    ivf = build_ivf_index(first, "vec_id", "embedding",
                          str(tmp_path / "ivf_ins"), n_clusters=4, seed=7)
    pre = {r["id"]: r["dist"] for r in ivf.topk(q, k=20, max_probe=1.0)
           .collect()}
    ivf.insert(rest, "vec_id", "embedding")
    post = {r["id"]: r["dist"] for r in ivf.topk(q, k=20, max_probe=1.0)
            .collect()}
    assert 40 in post and 50 in post        # inserted clones found
    for i, d in post.items():               # old docs' distances stable
        if i in pre:
            assert abs(d - pre[i]) < 1e-12
    assert ivf.vector_info()["vector_num_vectors"] == 59

    pq = build_pq_index(first, "vec_id", "embedding",
                        str(tmp_path / "pq_ins"), m=4, k_codes=8, seed=11)
    pq.insert(rest, "vec_id", "embedding")
    got = {r["id"] for r in pq.topk(q, k=8, rerank=3).collect()}
    assert {40, 50} <= got
    assert pq.vector_info()["vector_num_vectors"] == 59


def test_streaming_vector_ingest_exactly_once(spark, tmp_path, embeddings):
    """Streaming vector ingest: a micro-batch stream of embeddings feeds
    PqIndex.insert(epoch_id=batchId) via foreachBatch.  Epoch-keyed
    segment overwrite makes replays idempotent — re-running a committed
    batch body changes nothing — and inserted vectors are immediately
    searchable (same discipline as the text indexer's epoch segments)."""
    import glob as _glob
    import shutil as _shutil
    import os as _os
    from sparksearch.pipeline import build_pq_index
    path = str(tmp_path / "pq_stream")
    base = embeddings.filter("vec_id <> 0 AND vec_id < 40")
    idx = build_pq_index(base, "vec_id", "embedding", path,
                         m=4, k_codes=8, seed=11)
    src = str(tmp_path / "vec_src")
    _os.makedirs(src, exist_ok=True)
    n = 0
    for lo, hi in ((40, 50), (50, 60)):
        d = str(tmp_path / f"tmp_{lo}")
        embeddings.filter(f"vec_id >= {lo} AND vec_id < {hi}") \
            .coalesce(1).write.mode("overwrite").parquet(d)
        for p in sorted(_glob.glob(f"{d}/*.parquet")):
            _shutil.copy(p, f"{src}/part{n:03d}.parquet")
            n += 1

    replayed = {}

    def body(batch, epoch_id):
        idx.insert(batch, "vec_id", "embedding", epoch_id=epoch_id)
        replayed[epoch_id] = batch.count()

    q = (spark.readStream.schema("vec_id int, embedding array<float>, "
                                 "label int")
         .option("maxFilesPerTrigger", 1).parquet(src)
         .writeStream.foreachBatch(body)
         .option("checkpointLocation", str(tmp_path / "vec_ckpt")).start())
    q.processAllAvailable()
    q.stop()
    assert idx.vector_info()["vector_num_vectors"] == 59
    qv = embeddings.filter("vec_id = 0").first()["embedding"]
    got = {r["id"] for r in idx.topk(qv, k=8, rerank=3).collect()}
    assert {40, 50} <= got
    # replay: re-run a committed epoch's body — the segment is
    # overwritten in place, counts and results unchanged
    epoch = sorted(replayed)[0]
    batch = spark.read.parquet(f"{src}/part000.parquet")
    idx.insert(batch, "vec_id", "embedding", epoch_id=epoch)
    assert idx.vector_info()["vector_num_vectors"] == 59
    assert {r["id"] for r in idx.topk(qv, k=8, rerank=3).collect()} == got


def test_pq_tiny_corpus_clamps_codebook(spark, tmp_path, embeddings):
    """Fewer training vectors than k_codes clamps k (the IVF clamp's
    twin) instead of crashing numpy's sampler; zero vectors raise."""
    from sparksearch.pipeline import build_pq_index
    tiny = embeddings.filter("vec_id IN (1, 2, 3)")
    idx = build_pq_index(tiny, "vec_id", "embedding",
                         str(tmp_path / "pq_tiny"), m=4, k_codes=16,
                         seed=11)
    assert idx.meta["k"] == 3
    assert len(idx.topk([0.0] * 16, k=5).collect()) == 3
    with pytest.raises(ValueError, match="zero vectors"):
        build_pq_index(embeddings.filter("vec_id < 0"), "vec_id",
                       "embedding", str(tmp_path / "pq_zero"))


def test_vector_index_compact_vacuum(spark, tmp_path, embeddings):
    """compact() = amvacuumcleanup analog: after inserts + deletes, the
    index collapses to one base segment, tombstoned rows are physically
    gone, the tombstone list is cleared, and results are unchanged."""
    import os as _os
    from sparksearch.pipeline import build_ivf_index, build_pq_index
    q = embeddings.filter("vec_id = 0").first()["embedding"]

    for kind in ("ivf", "pq"):
        path = str(tmp_path / f"cmp_{kind}")
        first = embeddings.filter("vec_id <> 0 AND vec_id < 40")
        rest = embeddings.filter("vec_id >= 40")
        if kind == "ivf":
            idx = build_ivf_index(first, "vec_id", "embedding", path,
                                  n_clusters=4, seed=7)
            data = "clusters"
        else:
            idx = build_pq_index(first, "vec_id", "embedding", path,
                                 m=4, k_codes=8, seed=11,
                                 coarse_clusters=4)
            data = "codes"
        idx.insert(rest, "vec_id", "embedding", epoch_id=1)
        idx.delete([7, 13])
        before = ([r["id"] for r in idx.topk(q, k=10, max_probe=1.0)
                   .collect()] if kind == "ivf"
                  else [r["id"] for r in idx.topk(q, k=10, rerank=3)
                        .collect()])
        idx.compact()
        segs = sorted(_os.listdir(f"{path}/{data}"))
        assert segs == ["seg=base"], segs
        assert not _os.path.exists(f"{path}/tombstones")
        after = ([r["id"] for r in idx.topk(q, k=10, max_probe=1.0)
                  .collect()] if kind == "ivf"
                 else [r["id"] for r in idx.topk(q, k=10, rerank=3)
                       .collect()])
        assert after == before
        assert idx.vector_info()["vector_num_vectors"] == 57
        assert 7 not in after and 13 not in after


def test_lsh_index_lifecycle(spark, tmp_path, embeddings):
    """AnnIndex (LSH) lifecycle parity: epoch-keyed inserts with the
    FROZEN hyperplanes, tombstone deletes visible in both the banded
    probe and the exact fallback, compaction to one base segment."""
    import os as _os
    from sparksearch.pipeline.similarity import build_ann_index
    path = str(tmp_path / "lsh_life")
    idx = build_ann_index(embeddings.filter("vec_id <> 0 AND vec_id < 40"),
                          "vec_id", "embedding", path)
    idx.insert(embeddings.filter("vec_id >= 40"), "vec_id", "embedding",
               epoch_id=3)
    q = embeddings.filter("vec_id = 0").first()["embedding"]
    got = [r["id"] for r in idx.topk(q, k=6).collect()]
    assert {40, 50} <= set(got)           # inserted clones found
    idx.delete(got[:2])
    after = [r["id"] for r in idx.topk(q, k=6).collect()]
    assert not set(got[:2]) & set(after)
    # replayed epoch: same segment overwritten, results unchanged
    idx.insert(embeddings.filter("vec_id >= 40"), "vec_id", "embedding",
               epoch_id=3)
    assert [r["id"] for r in idx.topk(q, k=6).collect()] == after
    idx.compact()
    assert sorted(_os.listdir(f"{path}/buckets")) == ["seg=base"]
    assert not _os.path.exists(f"{path}/tombstones")
    assert [r["id"] for r in idx.topk(q, k=6).collect()] == after


def test_string_keyed_index_delete(spark, tmp_path, embeddings):
    """delete() over a string-keyed index must tombstone correctly —
    the tombstone schema derives from the stored id type instead of a
    hardcoded ``id long`` (ADVICE r4)."""
    from sparksearch.pipeline.similarity import build_ann_index
    path = str(tmp_path / "str_keys")
    emb = embeddings.filter("vec_id < 40").select(
        F.concat(F.lit("doc-"), F.col("vec_id")).alias("doc_key"),
        "embedding")
    idx = build_ann_index(emb, "doc_key", "embedding", path)
    q = embeddings.filter("vec_id = 0").first()["embedding"]
    got = [r["id"] for r in idx.topk(q, k=5).collect()]
    assert got and all(isinstance(i, str) for i in got)
    idx.delete(got[:2])                   # plain python strings
    after = [r["id"] for r in idx.topk(q, k=5).collect()]
    assert not set(got[:2]) & set(after)
    idx.delete(spark.createDataFrame([(got[2],)], "id string"))
    assert got[2] not in {r["id"]
                          for r in idx.topk(q, k=5).collect()}


def test_pq_arrow_encode_equals_expr(spark, tmp_path, embeddings):
    """encode="arrow" (vectorized numpy argmin in Arrow workers — the
    k=256-codebook scale hatch) produces byte-identical codes and
    identical topk to the codegen'd expr path."""
    from sparksearch.pipeline import build_pq_index
    a = build_pq_index(embeddings.filter("vec_id <> 0"), "vec_id",
                       "embedding", str(tmp_path / "pq_e"), m=4,
                       k_codes=8, seed=11, encode="expr")
    b = build_pq_index(embeddings.filter("vec_id <> 0"), "vec_id",
                       "embedding", str(tmp_path / "pq_a"), m=4,
                       k_codes=8, seed=11, encode="arrow")
    ca = {r["id"]: list(r["codes"]) for r in
          spark.read.parquet(str(tmp_path / "pq_e/codes")).collect()}
    cb = {r["id"]: list(r["codes"]) for r in
          spark.read.parquet(str(tmp_path / "pq_a/codes")).collect()}
    assert ca == cb
    q = embeddings.filter("vec_id = 0").first()["embedding"]
    assert a.topk(q, k=7).collect() == b.topk(q, k=7).collect()
    with pytest.raises(ValueError, match="unknown encode"):
        build_pq_index(embeddings.filter("vec_id <> 0"), "vec_id",
                       "embedding", str(tmp_path / "pq_x"), encode="nope")


def test_ivf_pq_residual_recall_and_accuracy(spark, tmp_path, embeddings):
    """Residual IVF-PQ (Jegou et al. 2011): codes quantize x - c_cell,
    so ADC uses per-probed-cell tables.  On the same m/k budget the
    residual estimate must be at least as accurate as raw-vector PQ on
    average, insert/topk keep working, and the clone cluster survives
    a 1-cell probe."""
    from sparksearch.pipeline import build_pq_index
    from sparksearch.pipeline.similarity import vector_topk
    q = embeddings.filter("vec_id = 0").first()["embedding"]
    exact = {r["vec_id"]: r["dist"] ** 2 for r in vector_topk(
        embeddings.filter("vec_id <> 0"), "embedding", q, 59,
        metric="l2", tiebreak=[F.col("vec_id").asc()]).collect()}

    def mean_abs_err(idx):
        est = {r["id"]: r["dist"]
               for r in idx.topk(q, k=59, max_probe=1.0).collect()}
        return sum(abs(est[i] - exact[i]) for i in est) / len(est)

    raw = build_pq_index(embeddings.filter("vec_id <> 0"), "vec_id",
                         "embedding", str(tmp_path / "pq_raw"), m=4,
                         k_codes=8, seed=11, coarse_clusters=4)
    res = build_pq_index(embeddings.filter("vec_id <> 0"), "vec_id",
                         "embedding", str(tmp_path / "pq_res"), m=4,
                         k_codes=8, seed=11, coarse_clusters=4,
                         residual=True)
    assert res.meta["residual"] is True
    assert mean_abs_err(res) <= mean_abs_err(raw)
    got = [r["id"] for r in res.topk(q, k=8, nprobe=1, rerank=3).collect()]
    assert {10, 20, 30, 40, 50} <= set(got)
    # insert under residual encoding: new rows searchable, old stable
    res2 = build_pq_index(embeddings.filter("vec_id <> 0 AND vec_id < 40"),
                          "vec_id", "embedding", str(tmp_path / "pq_res2"),
                          m=4, k_codes=8, seed=11, coarse_clusters=4,
                          residual=True)
    res2.insert(embeddings.filter("vec_id >= 40"), "vec_id", "embedding",
                epoch_id=1)
    got2 = {r["id"] for r in res2.topk(q, k=8, rerank=3,
                                       max_probe=1.0).collect()}
    assert {40, 50} <= got2
    with pytest.raises(ValueError, match="requires coarse_clusters"):
        build_pq_index(embeddings.filter("vec_id <> 0"), "vec_id",
                       "embedding", str(tmp_path / "pq_bad"),
                       residual=True)


def test_balanced_sample_exact_and_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, "big" if i < 40 else ("mid" if i < 52 else "small"))
         for i in range(55)], "id int, src string").cache()
    from sparksearch.pipeline import balanced_sample
    a = balanced_sample(docs, "src", 5, "id", seed=3)
    counts = {r["src"]: r["count"] for r in
              a.groupBy("src").count().collect()}
    assert counts == {"big": 5, "mid": 5, "small": 3}  # capped at size
    b = balanced_sample(docs, "src", 5, "id", seed=3)
    assert sorted(r["id"] for r in a.collect()) == \
           sorted(r["id"] for r in b.collect())
    c = balanced_sample(docs, "src", 5, "id", seed=4)
    assert sorted(r["id"] for r in a.collect()) != \
           sorted(r["id"] for r in c.collect())


def test_temperature_resample_flattens(spark):
    """alpha=0 balances the mix; alpha=1 keeps it; targets never exceed
    group sizes and the selection is deterministic."""
    rows = [(i, "en") for i in range(80)] + \
           [(80 + i, "de") for i in range(16)] + \
           [(96 + i, "yo") for i in range(4)]
    docs = spark.createDataFrame(rows, "id int, lang string").cache()
    from sparksearch.pipeline import temperature_resample
    flat = temperature_resample(docs, "lang", "id", alpha=0.0, total=30)
    fc = {r["lang"]: r["count"] for r in
          flat.groupBy("lang").count().collect()}
    assert fc["yo"] == 4 and fc["de"] == 10 and fc["en"] == 10
    keep = temperature_resample(docs, "lang", "id", alpha=1.0)
    kc = {r["lang"]: r["count"] for r in
          keep.groupBy("lang").count().collect()}
    assert kc == {"en": 80, "de": 16, "yo": 4}
    mid = temperature_resample(docs, "lang", "id", alpha=0.5, total=50)
    mc = {r["lang"]: r["count"] for r in
          mid.groupBy("lang").count().collect()}
    assert mc["en"] > mc["de"] > mc["yo"] >= 4 * 50 // 100
    again = temperature_resample(docs, "lang", "id", alpha=0.5, total=50)
    assert sorted(r["id"] for r in mid.collect()) == \
           sorted(r["id"] for r in again.collect())


def test_stratified_sample_fractions(spark):
    docs = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(2000)],
        "id int, s string").cache()
    from sparksearch.pipeline import stratified_sample
    out = stratified_sample(docs, "s", {"a": 0.5, "b": 0.1}, seed=11)
    c = {r["s"]: r["count"] for r in out.groupBy("s").count().collect()}
    assert 400 < c["a"] < 600 and 40 < c["b"] < 170
    out2 = stratified_sample(docs, "s", {"a": 0.5, "b": 0.1}, seed=11)
    assert sorted(r["id"] for r in out.collect()) == \
           sorted(r["id"] for r in out2.collect())


def test_ngram_contamination_and_decontaminate(spark):
    """Docs sharing an exact 3-gram with the eval set are flagged with
    the DISTINCT shared-gram count; decontaminate drops exactly those."""
    from sparksearch.pipeline import ngram_contamination, decontaminate
    train = spark.createDataFrame([
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "completely novel text about spark clusters tonight"),
        (3, "quick brown fox appears here too with more words"),
        (4, "short doc"),
    ], "id int, text string")
    evals = spark.createDataFrame([
        (100, "benchmark asks about the quick brown fox behavior"),
    ], "eid int, text string")
    hits = {r["id"]: r["n_hits"] for r in
            ngram_contamination(train, evals, "id").collect()}
    # doc1 shares "the quick brown" + "quick brown fox"; doc3 shares
    # "quick brown fox"; docs 2/4 share nothing
    assert hits[1] == 2 and hits[3] == 1
    assert 2 not in hits and 4 not in hits
    clean = {r["id"] for r in decontaminate(train, evals, "id").collect()}
    assert clean == {2, 4}
    # min_hits=2 keeps the single-gram overlap
    loose = {r["id"] for r in
             decontaminate(train, evals, "id", min_hits=2).collect()}
    assert loose == {2, 3, 4}


def test_redact_pii(spark):
    from sparksearch.pipeline import redact_pii
    docs = spark.createDataFrame([
        (1, "reach me at jane.doe+spam@corp.example.org or 10.1.2.3"),
        (2, "ssn 123-45-6789 phone +1 (555) 123-4567 end"),
        (3, "clean text with no identifiers at all"),
    ], "id int, text string")
    out = {r["id"]: r for r in redact_pii(docs).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_ip"] == 1
    assert out[1]["text_redacted"] == "reach me at <EMAIL> or <IP>"
    assert out[2]["n_ssn"] == 1 and out[2]["n_phone"] == 1
    # the SSN string also matches the phone shape — attributed ONCE,
    # to the earlier (more specific) SSN pattern
    assert "<SSN>" in out[2]["text_redacted"]
    assert "<PHONE>" in out[2]["text_redacted"]
    assert out[3]["pii_total"] == 0
    assert out[3]["text_redacted"] == out[3]["text"]
    assert out[1]["pii_total"] == 2 and out[2]["pii_total"] == 2


def test_redact_pii_job_replaces_text(spark):
    """The pipeline job's --redact-pii composition must SHIP the
    redacted value under the standard text column — not append a
    text_redacted sibling while the raw PII sails through (ADVICE r4,
    medium)."""
    from sparksearch.pipeline import redact_pii
    docs = spark.createDataFrame(
        [(1, "mail jane.doe@corp.example.org now")], "id int, text string")
    shipped = (redact_pii(docs, "text").drop("text")
               .withColumnRenamed("text_redacted", "text"))
    row = shipped.first()
    assert row["text"] == "mail <EMAIL> now"
    assert "text_redacted" not in shipped.columns


def test_repetition_stats(spark):
    from sparksearch.pipeline import repetition_stats
    docs = spark.createDataFrame([
        (1, "nav home\nabout us\nnav home\nnav home\ncontact"),
        (2, "buy now buy now buy now buy now totally legit"),
        (3, "a perfectly normal sentence with no repetition at all"),
        (4, ""),
    ], "id int, text string")
    out = {r["id"]: r for r in repetition_stats(docs, "id").collect()}
    assert out[1]["dup_line_frac"] == pytest.approx(2 / 5)
    # "buy now" appears 4x in 10 tokens -> 8/10 of tokens covered
    assert out[2]["max_2gram_count"] == 4
    assert out[2]["top_2gram_frac"] == pytest.approx(0.8)
    assert out[3]["dup_line_frac"] == 0.0
    assert out[3]["max_2gram_count"] == 1
    assert out[4]["max_2gram_count"] == 0
    assert out[4]["top_2gram_frac"] == 0.0
