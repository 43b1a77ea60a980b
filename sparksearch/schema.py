"""Index schema: which fields are indexed, how they are tokenized/stored.

Mirrors the reference's per-field search config:
- field types: pg_search/src/schema/mod.rs:60-82 (SearchFieldType)
- per-field options: pg_search/src/schema/config.rs (SearchFieldConfig:
  indexed, fast, record=basic|freq|position, tokenizer, normalizer)
- key_field requirement: pg_search/src/postgres/options.rs:300-305

Spark restatement: the "index" is a set of derived columnar tables
(postings / doc_stats / corpus_stats); ``fast`` fields are simply columns
of the source table (Spark is natively columnar), so only text analysis
config carries real weight here.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any

# record levels, reference schema/config.rs ("basic"|"freq"|"position")
RECORD_BASIC = "basic"      # postings carry doc ids only
RECORD_FREQ = "freq"        # + term frequencies (needed for BM25)
RECORD_POSITION = "position"  # + token positions (needed for phrase/proximity)


@dataclass
class FieldConfig:
    """Per-field indexing configuration (reference: SearchFieldConfig)."""

    name: str
    # key into analysis.TOKENIZERS.  An UNCONFIGURED text field tokenizes
    # with unicode_words — the reference's `SearchTokenizer::default()` is
    # UnicodeWords{remove_emojis: false} (tokenizers/src/manager.rs:436-443)
    # and field configs deserialize tokenizer with #[serde(default)]
    # (pg_search/src/schema/config.rs:41-42), so every bare bm25-indexed
    # TEXT column gets UAX29 word segmentation ("J.K." is ONE token).
    # The NAME "default" stays the simple tokenizer, as in the reference's
    # explicit `tokenizer: {"type": "default"}` (manager.rs:459).
    tokenizer: str = "unicode_words"
    source: str | None = None           # source column (alias fields: several
    # index fields from one column — reference schema/mod.rs:527-561)
    tokenizer_opts: dict = dc_field(default_factory=dict)
    filters: list | None = None          # token-filter chain; None = tokenizer default
    record: str = RECORD_POSITION
    # ``fast``: None = not explicitly configured.  Physically every doc
    # column is columnar parquet on Spark, and admin surfaces render it
    # as fast — but only an EXPLICIT ``fast=True`` lets a TOKENIZED
    # text field serve ORDER BY without the check_topk_scan warning
    # (join_order_by_is_null.out: {"name": {"fast": true}} rides TopK
    # under a default tokenizer; tokenizer_literal_normalized.out: the
    # same tokenizer WITHOUT fast warns).
    fast: bool | None = None

    indexed: bool = True
    lowercase: bool = True               # normalizer for keyword/raw fields
    k1: float = 1.2                      # per-field BM25 params (reference
    b: float = 0.75                      # typmod tuning, bm25-params.out)
    # QUERY-TIME tokenizer override (reference search_tokenizer option,
    # search_tokenizer.out): the autocomplete pattern — index with
    # prefix ngrams, analyze the query text with a word tokenizer so
    # 'sho' stays ONE token instead of being re-ngrammed.  None =
    # query text uses the index tokenizer.
    search_tokenizer: str | None = None
    search_tokenizer_opts: dict = dc_field(default_factory=dict)
    # store per-doc field lengths for BM25 length normalization
    # (reference fieldnorms flag; forced OFF for json fields — see
    # __post_init__)
    fieldnorms: bool = True
    # SQL-level column type (reference SearchFieldType routing,
    # schema/mod.rs:282-319): "text" (default), "citext" (forces the
    # lowercase normalizer regardless of config — mod.rs:87-95,
    # citext.out), "inet" (canonical IP terms — mod.rs:288, inet.out).
    field_type: str = "text"

    def __post_init__(self):
        # JSON object fields do not store fieldnorms (reference
        # paradedb.schema shows JsonObject | fieldnorms=f): BM25 over
        # json-path terms reads a per-doc fieldnorm of 1 while the
        # average fieldnorm stays the segment statistic — the asymmetry
        # snippet_json_02_advanced.out's scores pin (1.3175524, not the
        # length-normalized 0.8327621)
        if self.tokenizer == "json":
            self.fieldnorms = False
        if self.field_type == "citext":
            # citext ALWAYS lowercases — the reference overrides even an
            # explicit raw normalizer (default_config Text+is_citext_oid)
            self.lowercase = True
        elif self.field_type == "inet":
            # inet fields use the typed inet tokenizer (one canonical
            # term per value) unless the user picked something custom
            # (a bare unicode_words is the unset marker — the dataclass
            # default, like the reference's serde default)
            if self.tokenizer == "unicode_words" \
                    and not self.tokenizer_opts:
                self.tokenizer = "inet"
        elif self.field_type == "uuid":
            # UUID columns default to the keyword tokenizer, no
            # lowercasing, raw normalizer, fast (reference
            # SearchFieldType::Uuid — keyword_defaults_fast.out,
            # tokenize-uuid.out)
            if self.tokenizer == "unicode_words" \
                    and not self.tokenizer_opts:
                self.tokenizer = "keyword"
            self.lowercase = False
        elif self.field_type == "ltree":
            # ltree columns index as Tantivy Facet fields (ltree.out):
            # case-sensitive raw path terms; @@@ / term() over them is
            # hierarchical descendant-or-self matching (compiler gates)
            if self.tokenizer == "unicode_words" \
                    and not self.tokenizer_opts:
                self.tokenizer = "keyword"
            self.lowercase = False
        # The reference applies token filters in a FIXED order regardless
        # of how options were written (tokenizers/src/manager.rs:315-337:
        # token_length -> trim -> lower_caser -> stemmer -> stopwords ->
        # ascii_folding -> alpha_num_only, with stopwords_language
        # appended dynamically LAST).  Canonicalize here (stable sort) so
        # filter-list order never changes semantics.
        if self.filters:
            rank = {"remove_short": 0, "remove_long": 0, "trim": 1,
                    "lowercase": 2, "stemmer_light": 3, "stemmer": 3,
                    "stopwords": 4, "ascii_folding": 5,
                    "alpha_num_only": 6, "stopwords_language": 7}
            self.filters = sorted(
                self.filters,
                key=lambda f: rank.get(
                    f[0] if isinstance(f, tuple) else f, 4))

    def analyzer_key(self) -> tuple:
        return (self.tokenizer, tuple(sorted(self.tokenizer_opts.items())),
                tuple(self.filters or ()), self.lowercase)


def parse_tokenizer_expr(expr: str) -> tuple[str, dict, bool]:
    """Parse a tokenizer expression from a WITH option — a bare name
    ('unicode_words') or a parameterized form ('simple(lowercase=false)',
    'ngram(min_gram=1, max_gram=10, prefix_only=true)') — into
    (name, opts, lowercase)."""
    expr = expr.strip()
    lc = True
    if "(" not in expr:
        return expr, {}, lc
    if not expr.endswith(")"):
        raise ValueError(f"malformed tokenizer expression: {expr!r}")
    name, _, rest = expr.partition("(")
    opts: dict = {}
    for part in rest[:-1].split(","):
        part = part.strip()
        if not part:
            continue
        k, _, v = part.partition("=")
        k, v = k.strip(), v.strip().strip("'\"")
        if v.lower() in ("true", "false"):
            val: Any = v.lower() == "true"
        else:
            try:
                val = int(v)
            except ValueError:
                val = v
        if k == "lowercase":
            lc = bool(val)
        else:
            opts[k] = val
    return name.strip(), opts, lc


@dataclass
class IndexSchema:
    """Schema of one search index over one table.

    ``key_field`` is the unique document key (reference requires it:
    options.rs:300-305); it becomes ``doc_id`` in the index tables.
    """

    key_field: str
    text_fields: list  # list[FieldConfig]
    name: str = "search_idx"
    # reference ``sort_by='col ASC NULLS FIRST'`` (sort_by.out: Tantivy
    # segment pre-sorting for early-terminating ORDER BY scans).  Spark
    # analog: the saved docs table is range-partitioned + sorted within
    # partitions on this field, so parquet row-group min/max stats serve
    # ORDER BY ... LIMIT and keyset-paging range pruning.  Accepts
    # "col", "col asc", "col desc nulls last", or "none"
    # (case-insensitive, like the reference).
    sort_by: str | None = None
    # partial index (reference ``CREATE INDEX ... WHERE predicate``,
    # partial_index_gating.out): only rows satisfying the predicate are
    # indexed — BM25 stats, counts, and search results all reflect the
    # partial corpus.  Any Spark SQL boolean expression over the doc row.
    predicate: str | None = None
    # index-level default search-time tokenizer (reference
    # ``WITH (search_tokenizer = '...')``,
    # search_tokenizer_index_level.out): applies to every text/JSON
    # field without its own per-field override.  Accepts a bare name or
    # a parameterized form like 'simple(lowercase=false)'.
    search_tokenizer: str | None = None
    # segment partitioning (reference ``partition_by='tenant_id,
    # created_at'`` WITH option, partition_by.out): segments are
    # physically split by these field values so attribute-filtered
    # queries prune whole partitions.  Spark analog: the saved docs
    # table is written partitionBy(these columns) — parquet partition
    # pruning is the segment skip.  Comma-separated column list; empty
    # string disables (reference Test 2.2).
    partition_by: str | None = None
    # non-text INDEXED fields (reference ``numeric_fields`` /
    # ``boolean_fields`` WITH options, pg_search/src/schema/config.rs):
    # on Spark every doc column is already a fast field, so membership
    # here changes only TERM-QUERY SCORING — an equality over a declared
    # indexed numeric/boolean field is a Tantivy term query scored
    # idf-with-fieldnorm-1 (columnar_advanced_06_score_function.out
    # Test 3: `is_featured = true` contributes idf=1.7821901), while an
    # undeclared column stays a constant-score heap filter.  Lists of
    # column names.
    numeric_fields: list | None = None
    boolean_fields: list | None = None
    # DEPRECATED no-op (reference v0.24.1, datetime_fields_deprecated.out
    # / issue #5824): pre-v0.24.1 DDL carrying ``datetime_fields`` must
    # replay cleanly with a warning — datetimes are stored as i64
    # unconditionally now.  Accepted and ignored.
    datetime_fields: dict | None = None

    def indexed_attr_fields(self) -> set:
        """Names of declared indexed non-text (numeric/boolean) fields.
        An entry may be a plain column name, an (alias, source_expr)
        pair — the reference's aliased numeric expression fields
        (issue_3711.out: ``(i * 2)::pdb.alias('another_name')``) — or a
        dict like the reference's per-field JSON config
        (``numeric_fields = '{"price": {"fast": false}}'``,
        fast_fields_options.out)."""
        return {self._attr_name(e)
                for e in ((self.numeric_fields or [])
                          + (self.boolean_fields or []))}

    @staticmethod
    def _attr_name(e) -> str:
        if isinstance(e, dict):
            return e["name"]
        return e[0] if isinstance(e, (tuple, list)) else e

    def attr_fast(self, name: str) -> bool:
        """Whether a declared non-text field's fast (columnar) data is
        available for ORDER BY pushdown.  Numeric / boolean / datetime
        columns are fast BY DEFAULT (the reference stores them columnar
        unless configured otherwise) — an explicit ``{"fast": false}``
        in the field's config drops the column data and ORDER BY falls
        back to Normal+Sort (fast_fields_options.out Test 6).  Unknown
        / undeclared names return the default True."""
        for e in ((self.numeric_fields or []) + (self.boolean_fields or [])):
            if isinstance(e, dict) and e.get("name") == name:
                return bool(e.get("fast", True))
        return True

    def attr_source(self, name: str) -> str | None:
        """Source SQL expression of an ALIASED non-text indexed field,
        or None for plain column entries (issue_3711.out: predicates
        over the expression — ``(i * 2) = 2`` — compile to term queries
        on the alias)."""
        for e in ((self.numeric_fields or [])
                  + (self.boolean_fields or [])):
            if isinstance(e, (tuple, list)) and e[0] == name:
                return e[1]
            if isinstance(e, dict) and e.get("name") == name:
                return e.get("source")
        return None

    def validate(self, docs_schema=None) -> None:
        """Index-configuration validation with the reference's error
        strings (index_config_errors.out):

        - a key_field is mandatory,
        - configured field names must exist in the doc table (aliased
          fields reference their column via ``source`` instead),
        - the tokenizer type must be known,
        - the key field's BM25 configuration cannot be overridden —
          except a TEXT key under a keyword-family tokenizer, which IS
          the AM's forced key config (key-field-text-as-keyword.out).
        """
        if not self.key_field:
            raise ValueError(
                "index should have a `WITH (key_field='...')` option")
        if self.datetime_fields is not None:
            import warnings
            warnings.warn(
                'As of v0.24.1, "datetime_fields" is deprecated and '
                "should be removed. It no longer has any effect. The "
                "performance improvement options it provided are now on "
                "by default.", DeprecationWarning, stacklevel=2)
        from sparksearch.analysis import tokenizers
        known = set(tokenizers()) | {"inet"}
        names = list(docs_schema.names) if docs_schema is not None else None
        key_dt = (docs_schema[self.key_field].dataType.simpleString()
                  if names is not None and self.key_field in names else None)
        # per-tokenizer option surface (test_tokenizer_params.out:
        # tokenizer-specific params are rejected by the wrong tokenizer
        # with "Invalid option: 'X'. Allowed options: ...")
        tok_opts = {
            "ngram": {"min_gram", "max_gram", "prefix_only", "positions"},
            "edge_ngram": {"min_gram", "max_gram"},
            "regex": {"pattern"},
            "unicode_words": {"remove_emojis"},
            "json": {"value_tokenizer", "max_depth", "expand_dots"},
        }
        filter_names = {"remove_short", "remove_long", "trim",
                        "lowercase", "stemmer", "stemmer_light",
                        "stopwords", "ascii_folding", "alpha_num_only",
                        "stopwords_language"}
        for f in self.text_fields:
            if f.tokenizer not in known:
                raise ValueError(
                    f"field config should be valid for SearchFieldConfig"
                    f"::{f.name}: unknown tokenizer type: {f.tokenizer}")
            allowed = tok_opts.get(f.tokenizer, set())
            if f.tokenizer == "json":
                # a JSON field's value tokenizer brings its own option
                # surface (tokenizer-json.out: j::pdb.ngram(2,3))
                vt = f.tokenizer_opts.get("value_tokenizer")
                allowed = allowed | tok_opts.get(vt, set())
            for k in f.tokenizer_opts:
                if k not in allowed:
                    raise ValueError(
                        f"Invalid option: '{k}'. Allowed options: "
                        f"{', '.join(sorted(allowed | filter_names))}.")
            for flt in (f.filters or []):
                fname = flt[0] if isinstance(flt, tuple) else flt
                if fname not in filter_names:
                    raise ValueError(
                        f"Invalid option: '{fname}'. Allowed options: "
                        f"{', '.join(sorted(allowed | filter_names))}.")
            if (names is not None and f.source is None
                    and f.name not in names):
                if not f.name.replace("_", "a").isalnum():
                    # an expression used directly as the field name with
                    # no alias to address it by (tokenizer-alias.out:
                    # CREATE INDEX ... ((title || ' ' || desc)::pdb.simple)
                    # without 'alias=...') — the reference rejects it at
                    # index build (pg_search expression-index validation)
                    raise ValueError(
                        "indexed expression requires a tokenizer cast "
                        f"with an alias: {f.name}")
                raise ValueError(f"the column `{f.name}` does not exist "
                                 "in the USING clause")
            if f.name == self.key_field and f.source is None:
                text_key_raw = (key_dt in (None, "string")
                                and f.tokenizer in ("keyword", "raw",
                                                    "literal",
                                                    "literal_normalized"))
                if not text_key_raw:
                    raise ValueError(
                        "cannot override BM25 configuration for key_field "
                        f"'{self.key_field}', you must use an aliased "
                        "field name and 'column' configuration key")
        if names is not None:
            for col in self.indexed_attr_fields():
                if col not in names and self.attr_source(col) is None:
                    raise ValueError(f"the column `{col}` does not exist "
                                     "in the USING clause")

    def partition_fields(self, docs_schema=None) -> list:
        """Parse + validate partition_by against the doc schema
        (reference-exact error strings, partition_by.out §2-3)."""
        raw = self.partition_by
        if raw is None or raw == "":
            return []
        fields = [f.strip() for f in raw.split(",") if f.strip()]
        if not fields:
            raise ValueError("invalid partition_by value: must specify "
                             "at least one field")
        if docs_schema is not None:
            from pyspark.sql.types import ArrayType, MapType
            for f in fields:
                cfg = None
                try:
                    cfg = self.field(f)
                except KeyError:
                    pass
                # an aliased field partitions by its SOURCE column
                col = (cfg.source if cfg is not None and cfg.source
                       and cfg.source in docs_schema.names else f)
                if col not in docs_schema.names and cfg is None:
                    raise ValueError(f"`{f}` in `partition_by` does not "
                                     "exist")
                multi = cfg is not None and cfg.tokenizer == "json"
                if col in docs_schema.names:
                    multi = multi or isinstance(
                        docs_schema[col].dataType, (ArrayType, MapType))
                if multi:
                    raise ValueError(
                        f"`{f}` cannot be used in `partition_by` "
                        "because it is a multi-valued field")
        return fields

    # pgvector columns in the index (reference ``vec vector_l2_ops`` in
    # the CREATE INDEX column list, vector_search_pushdown.out): maps a
    # vector column name to its opclass — "l2" | "cosine" | "ip", the
    # "vector_*_ops" names, or None for the AM default (vector_l2_ops).
    # The opclass decides which distance operator (<-> / <=> / <#>) the
    # TopK scan can absorb; a mismatched operator falls back to an
    # exact sort with a planner warning.
    vector_fields: dict = dc_field(default_factory=dict)

    def vector_opclass(self, col: str) -> str:
        """The metric this index's TopK path serves for ``col``
        (reference: a bare vector column resolves to vector_l2_ops,
        the AM default — vector_search_pushdown.out)."""
        raw = self.vector_fields.get(col)
        if raw is None:
            return "l2"
        norm = str(raw).lower()
        if norm.startswith("vector_") and norm.endswith("_ops"):
            norm = norm[len("vector_"):-len("_ops")]
        if norm not in ("l2", "cosine", "ip"):
            raise ValueError(f"unknown vector opclass {raw!r} for "
                             f"column {col!r}")
        return norm

    def __post_init__(self):
        seen = set()
        for f in self.text_fields:
            if f.name in seen:
                # reference composite.out: two index sources resolving
                # to the same attribute name are rejected at definition
                raise ValueError(f"indexed attribute {f.name} defined "
                                 "more than once")
            seen.add(f.name)

    def field(self, name: str) -> FieldConfig:
        for f in self.text_fields:
            if f.name == name:
                return f
        # aliased-expression resolution (reference
        # aliased_text_expression_resolution.out): a query referencing a
        # COLUMN with no same-named index field resolves to the single
        # aliased expression field sourced from it; several candidates
        # are ambiguous and error with the reference message.  (A
        # direct/un-aliased field, handled above, always wins.)
        if "." not in name:
            import re
            pat = re.compile(rf"\b{re.escape(name)}\b")
            cands = [f for f in self.text_fields
                     if f.source and pat.search(f.source)]
            if len(cands) == 1:
                return cands[0]
            if len(cands) > 1:
                names = ", ".join(f"`{f.name}`"
                                  for f in sorted(cands,
                                                  key=lambda f: f.name))
                raise ValueError(
                    f"Query is ambiguous: column `{name}` matches "
                    f"multiple indexed fields: {names}. Use "
                    f"`{name}::pdb.alias(...)` to choose one")
        raise KeyError(f"field {name!r} not in index schema")

    def resolve(self, fieldref: str) -> tuple:
        """Resolve a field reference, supporting JSON path refs like
        ``metadata.color`` (reference json_fields nested paths,
        schema/mod.rs:321-323).  Returns (FieldConfig, term_prefix) where
        terms of a JSON path are stored as ``<path>:<token>``."""
        try:
            return self.field(fieldref), ""
        except KeyError:
            if "." in fieldref:
                head, path = fieldref.split(".", 1)
                cfg = self.field(head)
                if cfg.tokenizer == "json":
                    return cfg, path + ":"
            raise

    def value_analyzer(self, fieldref: str) -> FieldConfig:
        """The tokenizer config that applies to a query VALUE for this
        field reference (for JSON paths: the value tokenizer; when the
        field declares a ``search_tokenizer``, query text analyzes with
        THAT instead of the index tokenizer — search_tokenizer.out)."""
        cfg, prefix = self.resolve(fieldref)
        if prefix:
            vt_opts = {k: v for k, v in cfg.tokenizer_opts.items()
                       if k not in ("value_tokenizer", "max_depth",
                                    "expand_dots")}
            return FieldConfig(name=fieldref,
                               tokenizer=cfg.tokenizer_opts.get(
                                   "value_tokenizer", "unicode_words"),
                               tokenizer_opts=vt_opts,
                               lowercase=cfg.lowercase)
        if cfg.search_tokenizer is not None:
            return FieldConfig(name=cfg.name,
                               tokenizer=cfg.search_tokenizer,
                               tokenizer_opts=dict(
                                   cfg.search_tokenizer_opts),
                               filters=cfg.filters,
                               lowercase=cfg.lowercase)
        if self.search_tokenizer:
            # index-LEVEL search_tokenizer WITH option: a default
            # search-time analyzer for every text field that doesn't
            # declare its own (search_tokenizer_index_level.out);
            # parameterized forms like 'simple(lowercase=false)' parse
            # name + params
            name, opts, lc = parse_tokenizer_expr(self.search_tokenizer)
            return FieldConfig(name=cfg.name, tokenizer=name,
                               tokenizer_opts=opts, lowercase=lc)
        return cfg

    def resolve_lhs_cast(self, source: str, tokenizer: str,
                         tokenizer_opts: dict | None = None,
                         alias: str | None = None,
                         filters: list | None = None,
                         operator: str = "@@@",
                         query_text: str = "") -> FieldConfig:
        """Resolve a tokenizer cast used on the LEFT-hand side of a text
        query operator (``(t::pdb.ngram(2,3,'alias=x')) @@@ 'q'``) to
        the index field it addresses.

        The reference matches the cast against the index's expression
        fields by EXACT expression equality (tokenizer-invalid-lhs.out):
        a cast with no alias, an alias the index doesn't define, or any
        tokenizer/param difference from the indexed expression — even
        with a matching alias — fails to resolve, and the operator
        errors with ``query is incompatible with pg_search's
        `@@@(field, TEXT)` operator`` (same text for &&& ||| ### ===).
        Only an exact (alias, tokenizer, params, filters) match routes.
        """
        err = ValueError(
            f"query is incompatible with pg_search's "
            f"`{operator}(field, TEXT)` operator: `{query_text}`")
        if alias is None:
            raise err
        try:
            cfg = self.field(alias)
        except (KeyError, ValueError):
            raise err from None
        # canonicalize the cast's parameters exactly like an index
        # definition would (filter-order canonicalization, typed-field
        # defaults) and require identity with the indexed expression
        cast = FieldConfig(name=alias, source=source, tokenizer=tokenizer,
                           tokenizer_opts=dict(tokenizer_opts or {}),
                           filters=list(filters) if filters else None)
        if (cfg.source != cast.source or cfg.tokenizer != cast.tokenizer
                or cfg.tokenizer_opts != cast.tokenizer_opts
                or (cfg.filters or None) != (cast.filters or None)):
            raise err
        return cfg

    @property
    def field_names(self) -> list:
        return [f.name for f in self.text_fields]

    @property
    def default_field(self) -> str:
        return self.text_fields[0].name

    @staticmethod
    def from_options(key_field: str, text_fields: dict[str, dict[str, Any]] | None = None,
                     **kw) -> "IndexSchema":
        """Build from a dict shaped like the reference's WITH options JSON
        (e.g. text_fields='{"category": {"tokenizer": {"type": "keyword"}}}').
        """
        fields = []
        for name, cfg in (text_fields or {}).items():
            if "tokenizer" not in cfg:
                # serde default → SearchTokenizer::default() = UnicodeWords
                tok: dict | str = {"type": "unicode_words"}
            else:
                tok = cfg["tokenizer"]
            if isinstance(tok, dict):
                if "type" not in tok:
                    # manager.rs:453-455 error string
                    raise ValueError(
                        "a 'type' must be passed in pg_search tokenizer "
                        f"configuration, not found in: {tok!r}")
                tok_type = tok["type"]
            else:
                tok_type = str(tok)
            opts = {k: v for k, v in tok.items() if k != "type"} if isinstance(tok, dict) else {}
            fields.append(FieldConfig(
                name=name, tokenizer=tok_type, tokenizer_opts=opts,
                record=cfg.get("record", RECORD_POSITION),
                fast=cfg.get("fast"),
                lowercase=cfg.get("lowercase", True),
            ))
        return IndexSchema(key_field=key_field, text_fields=fields, **kw)
