"""Large-scale training-data pipeline operators.

These are the operations a 100 TB training-data pipeline needs on top of
the search engine: deduplication (exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine), similarity search (brute-force + LSH-bucketed
ANN), text analysis (language id, quality scoring, token counting,
fingerprinting), and multimodal column plumbing.
"""

from sparksearch.pipeline.dedup import (  # noqa: F401
    exact_duplicates, minhash_signatures, lsh_candidate_pairs,
    minhash_near_duplicates, simhash64, simhash_near_duplicates,
    shingle_jaccard_pairs, embedding_near_duplicates, dedup_keep_first,
    connected_components, duplicate_groups, dedup_canonical,
    semantic_duplicate_pairs, semantic_dedup,
    SigIndex, build_sig_index, load_sig_index, shared_token_spans,
    ngram_contamination, decontaminate,
)
from sparksearch.pipeline.similarity import (  # noqa: F401
    cosine_topk, lsh_cosine_topk, build_ivf_index, load_ivf_index,
    train_centroids, build_pq_index, load_pq_index, train_pq_codebooks,
)
from sparksearch.pipeline.text import (  # noqa: F401
    language_id, quality_scores, token_counts, fingerprint64,
    repetition_stats,
)
from sparksearch.pipeline.sampling import (  # noqa: F401
    stratified_sample, balanced_sample, temperature_resample,
)
from sparksearch.pipeline.scrub import redact_pii, PII_PATTERNS  # noqa: F401
