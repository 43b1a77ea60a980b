"""Text analysis: language id, quality scoring, token counting, document
fingerprinting — all pure column expressions (codegen, no python)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_STOPWORDS = {
    "en": ["the", "a", "of", "to", "and", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "ich"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "que", "pas", "je"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "que", "no", "por"],
}


def _tokens(text_col) -> Column:
    return F.filter(F.split(F.lower(text_col), r"[^\p{L}\p{N}]+"),
                    lambda x: x != "")


# Perf note shared by the operators below: HOF projections are
# interpreted (no whole-stage codegen, hence no common-subexpression
# elimination), so every textual reference to the tokenize expression
# re-runs the regex tokenizer per row.  Each operator therefore
# materializes the token array ONCE into a temp column in its own
# projection (referenced >1× by a non-cheap alias, so CollapseProject
# keeps the two projections separate) and derives everything from the
# column — measured 2.5× on q_quality_score at sf0.1 (guide §1.2).

def language_id(docs: DataFrame, text_col: str = "text",
                out_col: str = "lang_pred") -> DataFrame:
    """Stopword-ratio language heuristic over {en, de, fr, es}; 'und'
    (undetermined) when no language's stopwords appear."""
    tmp = "__li_ts"
    d = docs.withColumn(tmp, _tokens(F.col(text_col)))
    toks = F.col(tmp)
    n = F.greatest(F.size(toks), F.lit(1))

    def _ratio(words: list):
        return F.size(F.filter(toks, lambda t: t.isin(words))) / n

    scores = {lang: _ratio(words) for lang, words in _STOPWORDS.items()}
    best_score = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in reversed(list(scores)):
        pred = F.when((scores[lang] > 0) & (scores[lang] == best_score),
                      F.lit(lang)).otherwise(pred)
    return d.withColumn(out_col, pred).drop(tmp)


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features per doc: token count, mean word length,
    stopword ratio, punctuation ratio, digit ratio, distinct-token ratio
    (repetition signal)."""
    t = F.col(text_col)
    tmp = "__qs_ts"
    d = docs.withColumn(tmp, _tokens(t))
    toks = F.col(tmp)
    n = F.greatest(F.size(toks), F.lit(1))
    total_chars = F.greatest(F.length(t), F.lit(1))
    mean_wl = (F.aggregate(toks, F.lit(0).cast("bigint"),
                           lambda acc, x: acc + F.length(x)).cast("double") / n)
    stop = (F.size(F.filter(toks, lambda x: x.isin(_STOPWORDS["en"])))
            .cast("double") / n)
    punct = (F.length(F.regexp_replace(t, r"[^\p{Punct}]", ""))
             .cast("double") / total_chars)
    digit = (F.length(F.regexp_replace(t, r"[^0-9]", ""))
             .cast("double") / total_chars)
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n
    return d.select(
        *[c for c in docs.columns],
        F.size(toks).alias("n_tokens"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(stop, 6).alias("stopword_ratio"),
        F.round(punct, 6).alias("punct_ratio"),
        F.round(digit, 6).alias("digit_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_token_ratio"))


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens, word-regex tokens, and a BPE-ish subword count
    (word-chunks of ≤4 chars + punctuation marks — a deterministic proxy
    for tokenizer budget estimation)."""
    t = F.col(text_col)
    tmp = "__tc_ts"
    d = docs.withColumn(tmp, _tokens(t))
    words = F.col(tmp)
    ws = F.size(F.filter(F.split(t, r"\s+"), lambda x: x != ""))
    bpe_ish = (F.aggregate(words, F.lit(0).cast("bigint"),
                           lambda acc, x: acc + F.ceil(F.length(x) / 4.0)
                           .cast("bigint"))
               + F.length(F.regexp_replace(t, r"[^\p{Punct}]", "")))
    return d.select(
        *[c for c in docs.columns],
        ws.alias("ws_tokens"), F.size(words).alias("word_tokens"),
        bpe_ish.cast("long").alias("bpe_ish_tokens"))


def _kgram_shingles(text_col, k: int) -> Column:
    toks = _tokens(text_col)
    return F.when(F.size(toks) >= k, F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.concat_ws("\x1f", F.slice(toks, i + 1, k)))
    ).otherwise(F.array(F.concat_ws("\x1f", toks)))


def fingerprint64(text_col, k_gram: int = 4) -> Column:
    """64-bit content fingerprint: xxhash64 over the k-gram rolling-hash
    sequence of the normalized token stream (whitespace/punct/case-
    insensitive; the \\x1f separator keeps "ab c" != "a bc")."""
    grams = F.transform(_kgram_shingles(text_col, k_gram),
                        lambda s: F.xxhash64(s).cast("string"))
    return F.xxhash64(F.concat_ws(",", grams))


def kgram_min_fingerprint(text_col, k: int = 3) -> Column:
    """MinHash-1 sketch: lexicographic min of md5 over k-token shingles.
    Stable under edits away from the minimal shingle; computed with md5
    so external systems (and the DuckDB oracle) reproduce it exactly."""
    return F.array_min(F.transform(_kgram_shingles(text_col, k),
                                   lambda s: F.md5(s)))


def _max_multiplicity(arr: Column) -> Column:
    """Max multiplicity of any element — a fold over the SORTED array
    tracking (prev, current run, best run): pure codegen, no explode,
    no shuffle (the Gopher-rules repetition counters need the mode
    count per document, and a groupBy-per-doc would shuffle the corpus
    to compute a per-row number)."""
    s = F.array_sort(arr)
    init = F.struct(F.lit(None).cast("string").alias("prev"),
                    F.lit(0).alias("run"), F.lit(0).alias("best"))
    def step(acc, x):
        run = (F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
               .otherwise(F.lit(1)))
        return F.struct(x.alias("prev"), run.alias("run"),
                        F.greatest(acc["best"], run).alias("best"))
    return F.aggregate(s, init, step, lambda acc: acc["best"])


def repetition_stats(docs: DataFrame, key: str,
                     text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1,
    public), per document:

    - ``dup_line_frac``  — fraction of lines that are repeats of an
      earlier line (boilerplate/nav-chrome detector);
    - ``top_2gram_frac`` — fraction of tokens covered by the single
      most frequent word 2-gram (template/spam detector);
    - ``max_2gram_count`` — that 2-gram's raw count.

    Everything is per-row column expressions over split arrays — one
    projection, embarrassingly parallel, no shuffle at any corpus size.
    """
    d = docs.withColumn("__rs_ts", _tokens(F.col(text_col))) \
            .withColumn("__rs_lines",
                        F.filter(F.split(F.col(text_col), r"\n"),
                                 lambda x: F.trim(x) != ""))
    toks = F.col("__rs_ts")
    lines = F.col("__rs_lines")
    grams = F.when(F.size(toks) >= 2, F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)))
    ).otherwise(F.array().cast("array<string>"))
    # the fold result is referenced twice below — materialize it once
    # (interpreted projections re-evaluate per textual reference)
    d = d.withColumn("__rs_max2", _max_multiplicity(grams))
    max2 = F.col("__rs_max2")
    return d.select(
        F.col(key),
        ((F.size(lines) - F.size(F.array_distinct(lines)))
         / F.greatest(F.size(lines), F.lit(1))).alias("dup_line_frac"),
        (max2 * 2.0 / F.greatest(F.size(toks), F.lit(1)))
        .alias("top_2gram_frac"),
        max2.alias("max_2gram_count"))
