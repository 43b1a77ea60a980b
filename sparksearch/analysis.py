"""Text analysis: tokenizers + token-filter chains.

Re-creates the reference's tokenizer registry
(tokenizers/src/manager.rs:348-425, filter chain :315-337) Spark-first:

- The hot path (``default``/``simple``, ``whitespace``, ``regex``,
  ``keyword``/``raw``/``literal``) is built entirely from JVM-side
  ``pyspark.sql.functions`` (split / regexp_extract_all / transform /
  filter) so tokenization stays inside whole-stage codegen — no Python.
- Shape-heavy tokenizers (``ngram``, ``edge_ngram``, ``source_code``,
  ``chinese_compatible``, exact ``unicode_words``) are vectorized
  pandas UDFs (Arrow batches, never per-row Python).

An analyzer produces ``array<struct<t:string, p:int>>`` — token text plus
its position in the emitted stream (positions survive removal filters,
matching Lucene/Tantivy position semantics for phrase queries).

Token-stream parity note: the reference's regress goldens use the default
config (split on non-alphanumeric + lowercase); that path is bit-matched
here (see tests/test_analysis.py).
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column, functions as F, types as T

TOKEN_ARRAY_TYPE = T.ArrayType(
    T.StructType([
        T.StructField("t", T.StringType()),
        T.StructField("p", T.IntegerType()),
    ])
)

# unicode alphanumeric runs — Java regex for the JVM path, `regex` module-free
# python equivalent for the pandas/oracle path.
_JAVA_WORD = r"[\p{L}\p{N}]+"
_PY_WORD = re.compile(r"[^\W_]+", re.UNICODE)  # \w minus underscore
# unicode_words (UAX#29 approximation): words may contain interior
# apostrophes (MidLetter) and interior . , in numbers (MidNum).
# STRUCTURE MATTERS: each repetition of the outer group consumes a
# joiner + a whole alphanumeric RUN (iterative CharProperty loop), so
# java.util.regex recursion depth = number of interior joiners, not
# number of characters — a per-char alternation form StackOverflowed
# executors on multi-KB tokens.  The {,256} joiner cap bounds the
# recursion (≳256 interior punctuation joiners in ONE word is beyond
# any natural text; such a token splits at the cap).
# '_' is UAX29 ExtendNumLet: it joins words ("project_alpha", "_foo",
# "foo_" are each ONE word-bound segment; unicode-segmentation
# split_word_bounds, used by the reference's UnicodeWordsTokenizer,
# keeps the raw segment text underscores included).  The width-1
# lookbehinds enforce WB6/7 + WB11/12 exactly: a '.'/',' joins only
# letter×letter / digit×digit — "foo_.bar" breaks at the dot because
# '_' is not ALetter.
_JAVA_UAX29 = (r"_{0,64}[\p{L}\p{N}][\p{L}\p{N}_]*"
               r"(?:(?:(?<=[\p{L}])['’.][\p{L}]|(?<=[\p{N}])[.,][\p{N}])"
               r"[\p{L}\p{N}_]*){0,256}")

# RFC3339-ish datetime detection for JSON string values.  Tantivy types
# such values as DATE terms (one typed token, second precision) instead
# of running the text tokenizer over them — the behavior
# json_term_set.out locks in via is_datetime term_set queries.  Both
# analyzer twins canonicalize to UTC 'yyyy-MM-ddTHH:mm:ssZ'.
_RFC3339_RE = (r"\d{4}-\d{2}-\d{2}"
               r"([T ]\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})?)?")
_RFC3339_PY = re.compile("^" + _RFC3339_RE + "$")


def py_canon_datetime(s: str) -> str | None:
    """Canonical UTC second-precision rendering of an RFC3339-ish string
    (None when it isn't one).  Naive inputs are treated as UTC — the same
    convention as the JVM twin's cast under the UTC session timezone."""
    if not _RFC3339_PY.match(s):
        return None
    import datetime as _dt
    try:
        d = _dt.datetime.fromisoformat(s.strip().replace("Z", "+00:00"))
    except ValueError:
        return None
    if d.tzinfo is not None:
        d = d.astimezone(_dt.timezone.utc)
    return d.strftime("%Y-%m-%dT%H:%M:%SZ")


def py_canon_inet(s: str) -> str:
    """Postgres's canonical inet text rendering (reference
    SearchFieldType::Inet, schema/mod.rs:288): leading octet zeros
    dropped, IPv6 compressed + lowercased, a full-length netmask
    (/32, /128) suppressed, shorter masks kept.  Invalid input raises —
    the analog of Postgres's type-input error (a bm25 inet field can
    never contain an unparseable address)."""
    import ipaddress
    s = s.strip()
    # PG reads leading-zero IPv4 octets as DECIMAL ('010' == 10);
    # python's ipaddress rejects them outright — strip them first
    m = re.match(r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})"
                 r"(/\d{1,3})?$", s)
    if m:
        s = ".".join(str(int(o)) for o in m.groups()[:4]) \
            + (m.group(5) or "")
    try:
        if "/" in s:
            iface = ipaddress.ip_interface(s)
            if iface.network.prefixlen == iface.ip.max_prefixlen:
                return str(iface.ip)
            return f"{iface.ip}/{iface.network.prefixlen}"
        return str(ipaddress.ip_address(s))
    except ValueError:
        raise ValueError(
            f'invalid input syntax for type inet: "{s}"') from None


def canon_datetime_expr(v: Column) -> Column:
    """JVM twin of :func:`py_canon_datetime`: NULL unless RFC3339-ish."""
    is_dt = v.rlike("^" + _RFC3339_RE + "$")
    ts = F.try_to_timestamp(v)  # session tz is UTC (sparksearch.session)
    return F.when(is_dt & ts.isNotNull(),
                  F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'"))


# token-identical twin of _JAVA_UAX29 (same run-consuming structure and
# joiner cap, so long-token behavior matches the JVM path exactly)
_PY_UAX29 = re.compile(
    r"_{0,64}[^\W_]\w*"
    r"(?:(?:(?<=[^\W\d_])['’.][^\W\d_]|(?<=\d)[.,]\d)\w*){0,256}",
    re.UNICODE)

# unicode_words emits emoji as standalone tokens (tantivy's
# unicode-segmentation word iterator; expected/unicode_words.out:
# '🎂🚨👀🥜' → four tokens, searchable); remove_emojis strips them.
# A cluster = regional-indicator pair | pictographic base + optional
# VS16, extended by ZWJ-joined parts (👩‍⚕️ stays one token).
_EMOJI_BASE_PY = ("[©®‼⁉™"
                  "☀-➿⬀-⯿"
                  "〰〽㊗㊙"
                  "\U0001F000-\U0001FBFF]")
_PY_EMOJI_SRC = ("(?:[\U0001F1E6-\U0001F1FF]{2})|"
                 f"(?:{_EMOJI_BASE_PY}\ufe0f?"
                 f"(?:\u200d{_EMOJI_BASE_PY}\ufe0f?)*)")
_PY_UAX29_EMOJI = re.compile(
    r"_{0,64}[^\W_]\w*"
    r"(?:(?:(?<=[^\W\d_])['’.][^\W\d_]|(?<=\d)[.,]\d)\w*){0,256}|"
    + _PY_EMOJI_SRC,
    re.UNICODE)
_EMOJI_BASE_JAVA = (r"[\x{00a9}\x{00ae}\x{203c}\x{2049}\x{2122}"
                    r"\x{2600}-\x{27bf}\x{2b00}-\x{2bff}"
                    r"\x{3030}\x{303d}\x{3297}\x{3299}"
                    r"\x{1F000}-\x{1FBFF}]")
_JAVA_EMOJI_SRC = (r"(?:[\x{1F1E6}-\x{1F1FF}]{2})|"
                   rf"(?:{_EMOJI_BASE_JAVA}\x{{FE0F}}?"
                   rf"(?:\x{{200D}}{_EMOJI_BASE_JAVA}\x{{FE0F}}?)*)")
_JAVA_UAX29_EMOJI = _JAVA_UAX29 + "|" + _JAVA_EMOJI_SRC


# ---------------------------------------------------------------------------
# python-side tokenizers (used by pandas UDFs, the streaming indexer, and the
# brute-force oracle in tests)
# ---------------------------------------------------------------------------

def py_tokenize(text: str, tokenizer: str = "default", opts: dict | None = None,
                lowercase: bool = True) -> list[str]:
    """Tokenize one string exactly like the Spark-side analyzer.

    Returns the token list (positions are the list indexes).
    """
    if text is None:
        return []
    opts = opts or {}
    if tokenizer == "json":
        # JSON field (reference json_fields, schema/mod.rs:321-323):
        # terms are "<path>:<value-token>" with DOTTED NESTED PATHS
        # (pg_regress snippet_json_* / json goldens:
        # metadata_jsonb.details.author.description:test); arrays expand
        # their elements at the same path; recursion is depth-bounded
        # (opts max_depth, default 4) with deeper objects kept as compact
        # serialized scalars — bit-matching the JVM expression twin.
        import json as _json
        try:
            obj = _json.loads(text)
        except (ValueError, TypeError):
            return []
        if not isinstance(obj, dict):
            return []
        vt = opts.get("value_tokenizer", "unicode_words")
        max_depth = int(opts.get("max_depth", 4))
        out = []

        def scalar(prefix, v):
            if v is None:
                return
            if isinstance(v, bool):
                v = "true" if v else "false"
            elif not isinstance(v, str):
                v = _json.dumps(v, separators=(",", ":"))
            elif vt in ("default", "simple", "unicode_words"):
                # RFC3339-ish strings index as ONE typed date token
                # (Tantivy json date detection, json_term_set.out)
                dt = py_canon_datetime(v)
                if dt is not None:
                    out.append(f"{prefix}:{dt}")
                    return
            for t in py_tokenize(v, vt, opts if vt in
                                 ("ngram", "edge_ngram", "regex")
                                 else None, lowercase):
                out.append(f"{prefix}:{t}")

        def walk(prefix, v, depth):
            if isinstance(v, dict) and depth > 0:
                for k, vv in v.items():
                    walk(f"{prefix}.{k}" if prefix else k, vv, depth - 1)
            elif isinstance(v, (list, tuple)) and depth > 0:
                for el in v:
                    walk(prefix, el, depth - 1)
            elif isinstance(v, (dict, list, tuple)):
                scalar(prefix, _json.dumps(v, separators=(",", ":")))
            else:
                scalar(prefix, v)

        walk("", obj, max_depth)
        return out
    if tokenizer == "datetime":
        # typed date/timestamp field (Tantivy DateTime columns,
        # pg_regress parse.out created_at/last_updated_date terms):
        # RFC3339-ish values canonicalize to ONE UTC second-precision
        # term, so '2023-05-03', '2023-05-03 00:00:00' and
        # '2023-05-03T00:00:00Z' all hit the same dictionary entry;
        # non-datetime text (e.g. timetz '09:12:34+00') indexes raw.
        s = text.strip()
        if not s:
            return []
        d = py_canon_datetime(s)
        return [d if d is not None else s]
    if tokenizer == "inet":
        # typed inet field (reference SearchFieldType::Inet,
        # schema/mod.rs:288 + inet.out): ONE term per value in
        # Postgres's canonical inet text form, so '192.168.000.001',
        # '192.168.0.1' and '2001:0DB8::1' vs '2001:db8::1' all hit the
        # same dictionary entry — never lowercase-word-mangled.
        s = text.strip()
        if not s:
            return []
        return [py_canon_inet(s)]
    if lowercase and tokenizer not in ("keyword", "literal", "source_code"):
        # source_code must see the original case (camelCase boundaries);
        # it lowercases its own output tokens
        text = text.lower()
    if tokenizer in ("default", "simple"):
        return _PY_WORD.findall(text)
    if tokenizer == "unicode_words":
        if opts.get("remove_emojis"):
            return _PY_UAX29.findall(text)
        return _PY_UAX29_EMOJI.findall(text)
    if tokenizer == "whitespace":
        return [t for t in re.split(r"\s+", text) if t]
    if tokenizer in ("keyword", "raw", "literal", "literal_normalized"):
        # \x00 marks TEXT[] element boundaries (index.field_text_col):
        # each array element is its own raw term
        # (pushdown_array_field.out)
        return [t for t in text.split("\x00") if t] if text else []
    if tokenizer == "regex":
        if "pattern" not in opts:
            # the reference has no bare pdb.regex type — the tokenizer
            # only exists WITH its pattern argument (tokenizer-types-in-
            # create-table.out: `type "pdb.regex" does not exist`)
            raise ValueError('type "pdb.regex" does not exist: the '
                             "regex tokenizer requires a 'pattern' "
                             "argument")
        return re.findall(opts["pattern"], text)
    if tokenizer == "ngram":
        if (opts.get("positions")
                and int(opts.get("min_gram", 2)) != int(opts.get("max_gram", 3))):
            # reference ngram.out: positional gram phrases only make
            # sense when every start position emits exactly one gram
            raise ValueError("An invalid argument was passed: 'min_gram "
                             "must equal max_gram when positions are "
                             "enabled'")
        return _py_ngram(text, int(opts.get("min_gram", 2)), int(opts.get("max_gram", 3)),
                         bool(opts.get("prefix_only", False)))
    if tokenizer == "edge_ngram":
        return _py_edge_ngram(text, int(opts.get("min_gram", 1)), int(opts.get("max_gram", 5)))
    if tokenizer == "source_code":
        return _py_source_code(text)
    if tokenizer == "chinese_compatible":
        return _py_cjk(text)
    raise ValueError(f"unknown tokenizer {tokenizer!r}")


def _py_ngram(text: str, lo: int, hi: int, prefix_only: bool) -> list[str]:
    # char n-grams over the whole string (tantivy ngram.rs semantics:
    # spaces are ordinary chars and appear inside grams).  \x00 marks an
    # array-element boundary (index.field_text_col): each segment grams
    # separately — Tantivy never emits grams spanning two array values
    # (ngram-text-array.out).
    if "\x00" in text:
        out = []
        for seg in text.split("\x00"):
            out.extend(_py_ngram(seg, lo, hi, prefix_only))
        return out
    out = []
    n = len(text)
    starts = [0] if prefix_only else range(n)
    for i in starts:
        for g in range(lo, hi + 1):
            if i + g <= n:
                out.append(text[i:i + g])
    return out


def _py_edge_ngram(text: str, lo: int, hi: int) -> list[str]:
    out = []
    for w in _PY_WORD.findall(text):
        for g in range(lo, min(hi, len(w)) + 1):
            out.append(w[:g])
    return out


_CAMEL = re.compile(r"\d+|[A-Z]+(?![a-z])|[A-Z][a-z]+|[a-z]+")


def _py_source_code(text: str) -> list[str]:
    # camelCase / snake_case / digit-boundary aware (tantivy code.rs spirit)
    return [m.lower() for m in _CAMEL.findall(text)]


def _py_cjk(text: str) -> list[str]:
    # CJK chars become single tokens; other alphanumeric runs kept whole
    out, buf = [], []
    for ch in text:
        if "一" <= ch <= "鿿" or "぀" <= ch <= "ヿ":
            if buf:
                out.append("".join(buf)); buf = []
            out.append(ch)
        elif ch.isalnum():
            buf.append(ch)
        else:
            if buf:
                out.append("".join(buf)); buf = []
    if buf:
        out.append("".join(buf))
    return out


def py_analyze(text: str, cfg) -> list[tuple[str, int]]:
    """Full analyzer chain → [(token, position)]. Oracle for the Spark path."""
    toks = list(enumerate(py_tokenize(text, cfg.tokenizer, cfg.tokenizer_opts,
                                      cfg.lowercase)))
    for f in cfg.filters or ():
        # accept 'name', ('name',) or ('name', arg) filter specs
        name, arg = ((f[0], f[1] if len(f) > 1 else None)
                     if isinstance(f, tuple) else (f, None))
        if name == "remove_short":
            toks = [(p, t) for p, t in toks if len(t) >= arg]
        elif name == "remove_long":
            toks = [(p, t) for p, t in toks if len(t) <= arg]
        elif name == "stopwords":
            toks = [(p, t) for p, t in toks if t not in arg]
        elif name == "lowercase":
            toks = [(p, t.lower()) for p, t in toks]
        elif name == "trim":
            toks = [(p, t.strip()) for p, t in toks if t.strip()]
        elif name == "alpha_num_only":
            # ASCII alphanumerics ONLY (alpha_num_only_filter.out:
            # 'Český ...' with alpha_num_only=true -> {}; non-ASCII
            # letters survive only after ascii_folding)
            toks = [(p, t) for p, t in toks if _ASCII_ALNUM.fullmatch(t)]
        elif name == "ascii_folding":
            toks = [(p, _fold(t)) for p, t in toks]
        elif name == "stemmer_light":
            toks = [(p, _light_stem(t)) for p, t in toks]
        elif name == "stemmer":
            from sparksearch.stem import STEMMERS, stem as _stem
            lang = (arg or "english").lower()
            if lang not in STEMMERS:
                raise ValueError(f"stemmer language {arg!r} not supported")
            toks = [(p, _stem(t, lang)) for p, t in toks]
        elif name == "stopwords_language":
            from sparksearch.stem import stopwords_for
            sw = stopwords_for(arg or "english")
            toks = [(p, t) for p, t in toks if t not in sw]
        else:
            raise ValueError(f"unknown token filter {name!r}")
    return [(t, p) for p, t in toks]


_ASCII_ALNUM = re.compile(r"[0-9A-Za-z]+")

# Lucene/Tantivy ASCIIFoldingFilter mappings that NFKD cannot produce
# (no canonical decomposition): sharp s, slashed/crossed letters,
# ligatures, dotless i.
_FOLD_MAP = str.maketrans({
    "ß": "ss", "ẞ": "SS", "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
    "ø": "o", "Ø": "O", "đ": "d", "Đ": "D", "ð": "d", "Ð": "D",
    "þ": "th", "Þ": "TH", "ł": "l", "Ł": "L", "ħ": "h", "Ħ": "H",
    "ı": "i", "ĸ": "k", "ŋ": "n", "Ŋ": "N", "ŧ": "t", "Ŧ": "T"})


def _fold(t: str) -> str:
    t = "".join(c for c in unicodedata.normalize("NFKD", t)
                if not unicodedata.combining(c))
    return t.translate(_FOLD_MAP)


def _light_stem(t: str) -> str:
    # deterministic English s-stemmer (Harman 1991): plural stripping only.
    if len(t) > 3 and t.endswith("ies") and not t.endswith(("eies", "aies")):
        return t[:-3] + "y"
    if len(t) > 2 and t.endswith("es") and not t.endswith(("aes", "ees", "oes")):
        return t[:-1]
    if len(t) > 2 and t.endswith("s") and not t.endswith(("us", "ss")):
        return t[:-1]
    return t


# ---------------------------------------------------------------------------
# Spark-side analyzers
# ---------------------------------------------------------------------------

_JVM_TOKENIZERS = {"default", "simple", "whitespace", "regex", "keyword",
                   "raw", "literal", "literal_normalized", "unicode_words",
                   "json", "datetime"}


_JSON_JVM_VALUE_TOKS = {"default", "simple", "unicode_words",
                        "whitespace", "keyword", "raw", "literal"}


def _jvm_capable(cfg) -> bool:
    """True when this field's analyzer has a JVM expression twin.  A
    JSON field is JVM-side only while its VALUE tokenizer is (e.g. a
    j::pdb.ngram(2,3) cast grams every value → pandas path)."""
    if cfg.tokenizer not in _JVM_TOKENIZERS:
        return False
    if cfg.tokenizer == "json":
        vt = cfg.tokenizer_opts.get("value_tokenizer", "unicode_words")
        return vt in _JSON_JVM_VALUE_TOKS
    return True


def flat_token_array_expr(col: Column, cfg) -> Column | None:
    """Fast path: plain ``array<string>`` token array whose ordinal position
    IS the token position. Available when the tokenizer is JVM-side and no
    removal filter disturbs positions; the indexer pairs it with
    ``posexplode`` and skips the struct stream entirely."""
    if _jvm_capable(cfg) and not cfg.filters:
        return _jvm_token_array(col, cfg)
    return None


def analyzer_expr(col: Column, cfg) -> Column:
    """Column expression: text column → array<struct<t,p>> token stream.

    JVM-side (codegen) for the common tokenizers; Arrow pandas UDF for the
    shape-heavy ones. ``cfg`` is a schema.FieldConfig.
    """
    tok = cfg.tokenizer
    if _jvm_capable(cfg):
        arr = _jvm_token_array(col, cfg)
        stream = F.transform(
            arr, lambda x, i: F.struct(x.alias("t"), i.cast("int").alias("p")))
    else:
        stream = _pandas_token_stream(col, cfg)
    return _apply_filters(stream, cfg)


def _jvm_token_array(col: Column, cfg) -> Column:
    tok, opts = cfg.tokenizer, cfg.tokenizer_opts
    base = F.lower(col) if (cfg.lowercase and tok not in
                            ("keyword", "literal", "datetime")) else col
    if tok in ("default", "simple"):
        arr = F.regexp_extract_all(base, F.lit(_JAVA_WORD), 0)
    elif tok == "unicode_words":
        _uw = (_JAVA_UAX29 if opts.get("remove_emojis")
               else _JAVA_UAX29_EMOJI)
        arr = F.regexp_extract_all(base, F.lit(_uw), 0)
    elif tok == "whitespace":
        # Unicode whitespace split (tantivy char::is_whitespace; java \s
        # alone is ASCII-only while the py twin's re \s is Unicode-aware)
        arr = F.filter(F.split(base, "[\\s\\x{0085}\\p{Z}]+"),
                       lambda x: x != "")
    elif tok == "regex":
        if "pattern" not in opts:
            raise ValueError('type "pdb.regex" does not exist: the '
                             "regex tokenizer requires a 'pattern' "
                             "argument")
        arr = F.regexp_extract_all(base, F.lit(opts["pattern"]), 0)
    elif tok in ("keyword", "raw", "literal", "literal_normalized"):
        # split on \x00 TEXT[] element boundaries (no-op for plain text;
        # one raw term per array element — pushdown_array_field.out)
        arr = F.when(col.isNull() | (F.length(col) == 0), F.array().cast("array<string>")) \
               .otherwise(F.filter(F.split(base, "\x00"), lambda x: x != ""))
    elif tok == "datetime":
        # typed date field: canonical UTC term for RFC3339-ish values
        # (timestamp/date columns auto-cast to their ISO string under
        # the UTC session tz), raw string otherwise — JVM twin of the
        # py_tokenize 'datetime' branch
        s = F.trim(col.cast("string"))
        arr = F.when(col.isNull() | (F.length(s) == 0),
                     F.array().cast("array<string>")) \
               .otherwise(F.array(F.coalesce(canon_datetime_expr(s), s)))
    elif tok == "json":
        # Nested-path expansion, all in codegen'd column expressions:
        # from_json(map<string,string>) re-serializes nested objects /
        # arrays as compact JSON strings, so recursion is a bounded
        # expression tree (opts max_depth, default 4) — no Python on the
        # tokenize path.  Mirrors py_tokenize's json branch bit-for-bit
        # (arrays expand elements at the same path; beyond-depth objects
        # become compact serialized scalars).  Whether a value is
        # STRUCTURAL (object/array) vs a scalar string whose text merely
        # parses as JSON (e.g. {"note": "{\"a\":1}"}) cannot be decided
        # from the re-serialized string — both render identically — so a
        # parallel from_json(map<string,variant>) parse carries the
        # type-faithful value and schema_of_variant() gates recursion,
        # matching py_tokenize's isinstance(dict/list) walk.  Rendering
        # still uses the string map (Jackson preserves key order, like
        # json.dumps; variant to_json would sort keys).
        vt = opts.get("value_tokenizer", "unicode_words")
        max_depth = int(opts.get("max_depth", 4))
        empty = F.array().cast("array<string>")

        def _value_tokens(v):
            s = F.lower(v) if cfg.lowercase else v
            if vt in ("default", "simple", "unicode_words"):
                pat = (_JAVA_UAX29_EMOJI if vt == "unicode_words"
                       else _JAVA_WORD)
                toks = F.regexp_extract_all(s, F.lit(pat), 0)
                # RFC3339-ish string values → ONE typed date token
                # (mirrors py_tokenize's scalar(); json_term_set.out)
                dt = canon_datetime_expr(v)
                toks = F.when(dt.isNotNull(), F.array(dt)).otherwise(toks)
            elif vt == "whitespace":
                toks = F.filter(F.split(s, r"\s+"), lambda x: x != "")
            else:  # raw
                toks = F.when(v.isNull(), empty).otherwise(F.array(s))
            return F.coalesce(toks, empty)

        def _expand(vcol, var, path_col, depth):
            scalar = F.transform(_value_tokens(vcol),
                                 lambda x: F.concat(path_col, F.lit(":"), x))
            if depth <= 0:
                return F.coalesce(scalar, empty)
            sv = F.schema_of_variant(var)
            m_ = F.from_json(vcol, "map<string,string>")
            mv = F.from_json(vcol, "map<string,variant>")
            a_ = F.from_json(vcol, "array<string>")
            av = F.from_json(vcol, "array<variant>")
            obj = F.flatten(F.transform(
                F.map_entries(m_),
                lambda e: _expand(e["value"], F.element_at(mv, e["key"]),
                                  F.concat(path_col, F.lit("."), e["key"]),
                                  depth - 1)))
            arr_ = F.flatten(F.transform(
                a_, lambda el, i: _expand(el, F.element_at(av, i + 1),
                                          path_col, depth - 1)))
            return F.coalesce(
                F.when(sv.startswith("OBJECT") & m_.isNotNull(), obj)
                .when(sv.startswith("ARRAY") & a_.isNotNull(), arr_)
                .otherwise(scalar), empty)

        m = F.from_json(col, "map<string,string>")
        mv0 = F.from_json(col, "map<string,variant>")
        arr = F.flatten(F.transform(
            F.map_entries(m),
            lambda e: _expand(e["value"], F.element_at(mv0, e["key"]),
                              e["key"], max_depth - 1)))
    else:  # pragma: no cover
        raise ValueError(tok)
    return F.coalesce(arr, F.array().cast("array<string>"))


def _pandas_token_stream(col: Column, cfg) -> Column:
    tok, opts, lc = cfg.tokenizer, dict(cfg.tokenizer_opts), cfg.lowercase

    @F.pandas_udf(TOKEN_ARRAY_TYPE)
    def _tokenize(s: pd.Series) -> pd.Series:
        return s.map(lambda x: [
            {"t": t, "p": p}
            for p, t in enumerate(py_tokenize(x, tok, opts, lc))])

    return _tokenize(col)


def _apply_filters(stream: Column, cfg) -> Column:
    for f in cfg.filters or ():
        # accept 'name', ('name',) or ('name', arg) filter specs
        name, arg = ((f[0], f[1] if len(f) > 1 else None)
                     if isinstance(f, tuple) else (f, None))
        if name == "remove_short":
            stream = F.filter(stream, lambda s: F.length(s["t"]) >= arg)
        elif name == "remove_long":
            stream = F.filter(stream, lambda s: F.length(s["t"]) <= arg)
        elif name == "stopwords":
            words = list(arg)
            stream = F.filter(stream, lambda s: ~s["t"].isin(words))
        elif name == "lowercase":
            stream = F.transform(
                stream, lambda s: F.struct(F.lower(s["t"]).alias("t"), s["p"].alias("p")))
        elif name == "trim":
            # Unicode-whitespace trim (token_trim_filter.out: NBSP and
            # ideographic spaces strip too; java F.trim is ASCII-only,
            # the py twin's str.strip() is Unicode-aware)
            _ws = "[\\s\\x{0085}\\p{Z}]"
            stream = F.filter(
                F.transform(stream, lambda s: F.struct(
                    F.regexp_replace(s["t"],
                                     f"^{_ws}+|{_ws}+$", "").alias("t"),
                    s["p"].alias("p"))),
                lambda s: F.length(s["t"]) > 0)
        elif name == "alpha_num_only":
            # ASCII-only, the py twin's _ASCII_ALNUM (alpha_num_only_filter.out)
            stream = F.filter(stream, lambda s: s["t"].rlike("^[0-9A-Za-z]+$"))
        elif name == "stopwords_language":
            from sparksearch.stem import stopwords_for
            words = sorted(stopwords_for(arg or "english"))
            stream = F.filter(stream, lambda s: ~s["t"].isin(words))
        elif name in ("ascii_folding", "stemmer_light", "stemmer"):
            if name == "ascii_folding":
                fn = _fold
            elif name == "stemmer_light":
                fn = _light_stem
            else:
                from sparksearch.stem import STEMMERS
                lang = (arg or "english").lower()
                if lang not in STEMMERS:
                    raise ValueError(
                        f"stemmer language {arg!r} not supported")
                fn = STEMMERS[lang]

            stream = _token_map_udf(fn)(stream)
        else:
            raise ValueError(f"unknown token filter {name!r}")
    return stream


def _token_map_udf(fn):
    """Factory (early-binds ``fn`` — a loop-shared closure would late-bind
    to the last filter in the chain)."""

    @F.pandas_udf(TOKEN_ARRAY_TYPE)
    def _map(sv: pd.Series) -> pd.Series:
        return sv.map(lambda arr: [
            {"t": fn(e["t"]), "p": e["p"]}
            for e in ([] if arr is None else arr)])

    return _map


def tokenizers() -> list[str]:
    """Reference's ``paradedb.tokenizers()`` listing (api/tokenize.rs:49-56)."""
    return sorted(_JVM_TOKENIZERS | {"ngram", "edge_ngram", "source_code",
                                     "chinese_compatible"})
