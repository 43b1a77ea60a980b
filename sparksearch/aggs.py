"""Elasticsearch-compatible JSON aggregation DSL → DataFrame compiler.

Reference surface: ``pdb.agg('{...}')`` / ``paradedb.aggregate(index,
query, agg)`` (pg_search/src/api/aggregate.rs:67-150), executed by Tantivy
aggregations; SQL GROUP BY pushdown maps to the same buckets
(aggregatescan/*, json_rewrite.rs).

Supported buckets: ``terms`` (size/missing/order), ``histogram``
(interval/offset/min_doc_count), ``date_histogram`` (fixed_interval /
calendar_interval day|hour|minute|month|year), ``range`` (from/to edges,
keyed), ``filters`` (named sub-filters).  Metrics: ``value_count``,
``cardinality`` (approx, like ES), ``sum`` ``avg`` ``min`` ``max``,
``stats``, ``percentiles``, ``top_hits``.  Buckets nest via ``aggs``.

Result shape mirrors ES: ``{"aggregations": {name: {"buckets": [...]}}}``
via :func:`run_aggs` / :func:`search_aggregate`.

Execution notes (scale): every bucket level compiles to ONE
``groupBy(...).agg(...)`` over the (optionally search-filtered) doc
DataFrame — Catalyst does partial/final aggregation; nested buckets
compile to a single multi-key groupBy per leaf level (no per-bucket
re-scans).  ``top_hits`` uses a ranking window per bucket key.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F, Window as W


class AggError(ValueError):
    pass


_CAL = {"minute": "minute", "hour": "hour", "day": "day", "week": "week",
        "month": "month", "quarter": "quarter", "year": "year"}
_FIXED_MS = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000, "d": 86_400_000}


def _fixed_interval_ms(s: str) -> int:
    import re
    m = re.match(r"^(\d+)(ms|s|m|h|d)$", s)
    if not m:
        raise AggError(f"bad fixed_interval {s!r}")
    return int(m.group(1)) * _FIXED_MS[m.group(2)]


def _resolve_field(name: str, df=None, numeric: bool = False, schema=None):
    """Agg field reference → Column.  Reference agg definitions address
    nested JSON paths directly ('metadata_json.value' — json_fields with
    expand_dots, json_agg.out / json_groupby_orderby_limit.out); when the
    path head is a plain JSON STRING column, extract with
    get_json_object (codegen'd JSON path — the Spark analog of the
    tantivy json fast field), cast to double in numeric (metric /
    histogram) contexts.  An EXPRESSION index field (reference
    aggregate_scan_expressions.out: ``(lower(record_type)::pdb.literal)``
    grouped by its fast field) resolves through its schema ``source``
    expression when the name is not a physical column.  Anything else
    resolves as a normal (possibly struct) column reference."""
    if (schema is not None and df is not None and name not in df.columns
            and "." not in name):
        cfg = next((f for f in schema.text_fields
                    if f.name == name and f.source), None)
        if cfg is not None:
            c = F.expr(cfg.source)
            return c.cast("double") if numeric else c
    if df is not None and "." in name:
        head = name.split(".", 1)[0]
        from pyspark.sql.types import StringType
        if (head in df.columns
                and isinstance(df.schema[head].dataType, StringType)):
            c = F.get_json_object(F.col(head), "$." + name.split(".", 1)[1])
            return c.cast("double") if numeric else c
    return F.col(name)


def _bucket_expr(spec: dict, df=None, schema=None):
    """(bucket kind, key Column, post-filter) for one bucket agg spec."""
    if "terms" in spec:
        t = spec["terms"]
        col = _resolve_field(t["field"], df, schema=schema)
        if "missing" in t:
            col = F.coalesce(col, F.lit(t["missing"]))
        return "terms", col, t
    if "histogram" in spec:
        h = spec["histogram"]
        interval = float(h["interval"])
        off = float(h.get("offset", 0))
        key = (F.floor((_resolve_field(h["field"], df, numeric=True,
                                        schema=schema) - off)
                       / interval) * interval + off)
        return "histogram", key, h
    if "date_histogram" in spec:
        h = spec["date_histogram"]
        c = F.col(h["field"])
        if "calendar_interval" in h:
            unit = _CAL.get(h["calendar_interval"])
            if not unit:
                raise AggError(f"bad calendar_interval {h['calendar_interval']}")
            key = F.date_trunc(unit, c)
        else:
            ms = _fixed_interval_ms(h["fixed_interval"])
            epoch_ms = (c.cast("double") * 1000).cast("long")
            key = F.timestamp_millis((F.floor(epoch_ms / ms) * ms).cast("long"))
        return "date_histogram", key, h
    if "range" in spec:
        r = spec["range"]
        c = F.col(r["field"])
        expr = F.lit(None).cast("string")
        whens = []
        for i, b in enumerate(r["ranges"]):
            frm, to = b.get("from"), b.get("to")
            cond = F.lit(True)
            if frm is not None:
                cond = cond & (c >= frm)
            if to is not None:
                cond = cond & (c < to)
            key = b.get("key") or f"{frm if frm is not None else '*'}-{to if to is not None else '*'}"
            whens.append((cond, key))
        for cond, key in reversed(whens):
            expr = F.when(cond, F.lit(key)).otherwise(expr)
        return "range", expr, r
    if "filters" in spec:
        fl = spec["filters"]["filters"]
        # ES filters semantics: buckets are NOT mutually exclusive — a
        # doc counts in EVERY filter it matches (the reference's twelve
        # overlapping FILTER(WHERE ...) counts sum to far more than the
        # row count, groupby_filter_mixed_buckets.out).  The key column
        # is the ARRAY of matching bucket names; _bucket_level explodes.
        arms = [F.when(_filter_cond(cond, df=df, schema=schema),
                       F.lit(name))
                for name, cond in fl.items()]
        return "filters", F.array_compact(F.array(*arms)), spec["filters"]
    raise AggError(f"unknown bucket agg: {list(spec)}")


def _filter_cond(cond: dict, df=None, schema=None):
    """ES filter sub-DSL → Column (term / range / match_all / match).

    ``match`` is the reference's ``COUNT(*) FILTER (WHERE field @@@
    'needle')`` form (groupby_filter_mixed_buckets.out): the needle runs
    through the FIELD's analyzer chain and the condition is true when any
    analyzed needle token appears in the doc's analyzed token stream —
    so ``brand @@@ 'Apple'`` matches the lowercased index token."""
    if "match" in cond:
        ((f, needle),) = cond["match"].items()
        if schema is None:
            raise AggError(
                "match filter requires index context — use "
                "search_aggregate/aggregate or pass schema= to run_aggs")
        from sparksearch.analysis import py_analyze, analyzer_expr
        toks = [t for t, _ in py_analyze(str(needle),
                                         schema.value_analyzer(f))]
        if not toks:
            return F.lit(False)
        cfg, _ = schema.resolve(f)
        from sparksearch.index import field_text_col
        text = field_text_col(df, cfg) if df is not None else F.col(cfg.name)
        stream = F.transform(analyzer_expr(text, cfg), lambda x: x["t"])
        return F.arrays_overlap(stream,
                                F.array(*[F.lit(t) for t in toks]))
    if "term" in cond:
        ((f, v),) = cond["term"].items()
        if isinstance(v, dict):
            v = v["value"]
        return F.col(f) == F.lit(v)
    if "range" in cond:
        ((f, b),) = cond["range"].items()
        c, out = F.col(f), F.lit(True)
        if "gte" in b:
            out = out & (c >= b["gte"])
        if "gt" in b:
            out = out & (c > b["gt"])
        if "lte" in b:
            out = out & (c <= b["lte"])
        if "lt" in b:
            out = out & (c < b["lt"])
        return out
    if "match_all" in cond:
        return F.lit(True)
    raise AggError(f"unsupported filter {list(cond)}")


def _metric_exprs(name: str, spec: dict, df=None, schema=None) -> list:
    """One metric agg → list of (alias, Column expr) pairs."""
    kind = next(iter(spec))
    field = spec[kind].get("field") if isinstance(spec[kind], dict) else None
    numeric = kind not in ("value_count", "cardinality")
    c = (_resolve_field(field, df, numeric=numeric, schema=schema)
         if field else None)
    missing = (spec[kind].get("missing")
               if isinstance(spec[kind], dict) else None)
    if c is not None and missing is not None:
        # ES metric "missing" option (and the reference's
        # COUNT(COALESCE(col, const)) pushdown — issue_3196.out renders
        # it as {"value_count": {"field": col, "missing": const}})
        c = F.coalesce(c, F.lit(missing))
    if kind == "value_count":
        # tantivy renders value_count as f64 — `{"value": 3.0}` in
        # expected/term_set_agg.out's aggregate envelope
        return [(name, F.count(c).cast("double"))]
    if kind == "cardinality":
        return [(name, F.approx_count_distinct(c))]
    if kind in ("sum", "avg", "min", "max"):
        return [(name, getattr(F, kind)(c))]
    if kind == "stats":
        return [(f"{name}.count", F.count(c)), (f"{name}.min", F.min(c)),
                (f"{name}.max", F.max(c)), (f"{name}.avg", F.avg(c)),
                (f"{name}.sum", F.sum(c))]
    if kind == "percentiles":
        pcts = spec[kind].get("percents", [1, 5, 25, 50, 75, 95, 99])
        return [(f"{name}.{p}", F.percentile_approx(c, p / 100.0))
                for p in pcts]
    raise AggError(f"unknown metric agg {kind!r}")


def _is_metric(spec: dict) -> bool:
    return next(iter(spec)) in ("value_count", "cardinality", "sum", "avg",
                                "min", "max", "stats", "percentiles")


def _is_top_hits(spec: dict) -> bool:
    return next(iter(spec)) == "top_hits"


class AggBucketLimitError(RuntimeError):
    """An aggregation level exceeded config.max_agg_buckets (reference:
    pg_search api/aggregate.rs bucket_limit / paradedb.max_term_agg_buckets;
    Tantivy aborts with "too many buckets" instead of exhausting memory)."""


def run_aggs(df: DataFrame, aggs, query_filter=None, schema=None) -> dict:
    """Execute an ES-style aggs dict over ``df``; returns the ES-shaped
    result dict. ``aggs`` may be a JSON string (pdb.agg('{...}'))."""
    if isinstance(aggs, str):
        aggs = json.loads(aggs)
    if query_filter is not None:
        df = df.filter(query_filter)
    _validate_agg_fields(aggs, df, schema=schema)
    out = {}
    for name, spec in aggs.items():
        out[name] = _run_one(df, name, spec, parent_keys=[], schema=schema)
    return {"aggregations": out}


def _validate_agg_fields(aggs: dict, df: DataFrame, schema=None) -> None:
    """Recursive field validation (agg-validate.out): every ``field``
    reference — top level or nested — must name an indexed field (a JSON
    path validates its root column); the error string and the sorted
    available-fields list match the reference exactly."""
    # only engine-internal (__-prefixed) columns are hidden — a user
    # column named 'score' or 'doc_id' is a legitimate agg target
    cols = [c for c in df.columns if not c.startswith("__")]
    if schema is not None:
        cols += [f.name for f in schema.text_fields
                 if f.source and f.name not in cols]
    available = sorted(cols)
    avail_set = set(available)

    known = {"range", "histogram", "date_histogram", "terms", "filter",
             "filters", "composite", "avg", "value_count", "max", "min",
             "stats", "extended_stats", "sum", "percentiles", "top_hits",
             "cardinality"}

    def walk(node) -> None:
        # fail-fast structural errors, reference strings (custom-agg.out
        # Tests 9-11)
        if not isinstance(node, dict):
            raise AggError(
                "pdb.agg() expects a JSON object representing a Tantivy "
                'aggregation. Example: {"terms": {"field": "country"}}')
        if "buckets" in node:
            raise AggError(
                "pdb.agg() received JSON with 'buckets' key. Remove the "
                "'buckets' wrapper - pdb.agg() expects a single "
                "aggregation definition. Example: "
                '{"terms": {"field": "country"}} instead of '
                '{"buckets": {"terms": {"field": "country"}}}')
        for kind, body in node.items():
            if kind == "aggs" and isinstance(body, dict):
                for sub in body.values():
                    walk(sub)
                continue
            if kind not in known:
                raise AggError(
                    "Failed to deserialize custom aggregate: unknown "
                    f"variant `{kind}`, expected one of `range`, "
                    "`histogram`, `date_histogram`, `terms`, `filter`, "
                    "`composite`, `avg`, `value_count`, `max`, `min`, "
                    "`stats`, `extended_stats`, `sum`, `percentiles`, "
                    "`top_hits`, `cardinality`")
            if isinstance(body, dict) and "field" in body:
                f = body["field"]
                if f not in avail_set and \
                        f.split(".", 1)[0] not in avail_set:
                    raise AggError(
                        f"Aggregation references invalid field '{f}'. "
                        "Available indexed fields are: "
                        f"[{', '.join(available)}]")

    for spec in aggs.values():
        walk(spec)


def _run_one(df: DataFrame, name: str, spec: dict, parent_keys: list,
             schema=None) -> dict:
    if _is_metric(spec):
        kind = next(iter(spec))
        field = (spec[kind].get("field")
                 if isinstance(spec[kind], dict) else None)
        if (kind in ("min", "max", "avg", "sum") and field
                and field in df.columns
                and df.schema[field].dataType.typeName()
                in ("timestamp", "date")):
            # single-value metrics on datetime fields: PG-epoch-µs value
            # + a key_as_string ISO timestamp, the same convention as
            # date_histogram bucket keys (agg-validate.out Tests 16-19:
            # the rewriter applies uniformly, sum included)
            import datetime as _dt
            us = (F.unix_micros(F.col(field).cast("timestamp"))
                  - F.lit(946684800 * 1_000_000)).cast("double")
            v = df.agg(getattr(F, kind)(us).alias("v")).collect()[0]["v"]
            if v is None:
                return {"value": None}
            ts = _dt.datetime.fromtimestamp(v / 1e6 + 946684800.0,
                                            tz=_dt.timezone.utc)
            return {"value": float(v),
                    "key_as_string": ts.strftime("%Y-%m-%dT%H:%M:%SZ")}
        pairs = _metric_exprs("v", spec, df, schema=schema)
        row = df.agg(*[e.alias(a) for a, e in pairs]).collect()[0]
        vals = row.asDict()
        if list(vals) == ["v"]:
            return {"value": _jval(vals["v"])}
        return {k.split(".", 1)[1]: _jval(v) for k, v in vals.items()}
    if _is_top_hits(spec):
        hits_by_key = _top_hits_level(df, spec, [])
        return {"hits": hits_by_key.get((), [])}
    by_parent = _bucket_level(df, spec, [], schema=schema)
    return by_parent.get((), _empty_envelope(spec))


def _top_hits_sort_cols(spec: dict) -> list:
    cols = []
    for s in spec["top_hits"].get("sort", []):
        ((f, o),) = s.items() if isinstance(s, dict) else ((s, "asc"),)
        order = o["order"] if isinstance(o, dict) else o
        cols.append(F.col(f).desc() if order == "desc" else F.col(f).asc())
    return cols


def _top_hits_level(df: DataFrame, spec: dict, pcols: list) -> dict:
    """top_hits for EVERY bucket in one job: ranking window partitioned by
    the parent key columns (reference executes per-bucket top_hits via
    tantivy collectors per segment; per-bucket driver loops would be an
    N+1-jobs anti-pattern at scale)."""
    th = spec["top_hits"]
    size = th.get("size", 3)
    cols = _top_hits_sort_cols(spec)
    if pcols:
        w = W.partitionBy(*pcols).orderBy(*(cols or [F.lit(1)]))
        ranked = (df.withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") <= size).drop("__rn"))
    else:
        ranked = df.orderBy(*cols).limit(size) if cols else df.limit(size)
    src = th.get("_source")
    keep = (pcols + src) if src else ranked.columns
    rows = ranked.select(*keep).collect()
    out: dict = {}
    for r in rows:
        d = r.asDict(recursive=True)
        ptuple = tuple(d.pop(p) for p in pcols)
        if src:
            d = {k: d[k] for k in src}
        else:
            d = {k: v for k, v in d.items() if not k.startswith("__k")}
        out.setdefault(ptuple, []).append(d)
    return out


def _empty_envelope(spec: dict) -> dict:
    """Envelope for a bucket agg evaluated over ZERO rows (a zero-count
    parent bucket).  terms and histograms emit no buckets — there are no
    observed keys to enumerate — but range/filters buckets are DEFINED
    by the request, so every one appears at doc_count 0 with NULL
    metrics, recursively: the same shape the zero-fill left-joins
    produce one level up (ES keyed-bucket semantics; custom-agg.out
    Test 13 zero-count ranges)."""
    if "terms" in spec:
        return {"buckets": [], "sum_other_doc_count": 0,
                "doc_count_error_upper_bound": 0}
    defined = []
    if "range" in spec:
        for b in spec["range"]["ranges"]:
            frm, to = b.get("from"), b.get("to")
            defined.append(b.get("key") or
                           (f"{frm if frm is not None else '*'}"
                            f"-{to if to is not None else '*'}"))
    elif "filters" in spec:
        defined = sorted(spec["filters"]["filters"])
    buckets = []
    for key in defined:
        b = {"key": key, "doc_count": 0}
        for sname, sspec in spec.get("aggs", {}).items():
            if _is_top_hits(sspec):
                b[sname] = {"hits": []}
            elif _is_metric(sspec):
                b[sname] = _null_metric(sspec)
            else:
                b[sname] = _empty_envelope(sspec)
        buckets.append(b)
    return {"buckets": buckets}


def _null_metric(spec: dict) -> dict:
    """The metric shape a zero-filled bucket carries: every value NULL
    (the fill is a left join, so metric columns come back NULL — the
    SQL twin's aggregate-over-no-rows)."""
    kind = next(iter(spec))
    if kind == "stats":
        return {k: None for k in ("count", "min", "max", "avg", "sum")}
    if kind == "percentiles":
        pcts = spec[kind].get("percents", [1, 5, 25, 50, 75, 95, 99])
        return {f"{p}": None for p in pcts}
    return {"value": None}


def _fill_histogram_gaps(g: DataFrame, kind: str, opts: dict,
                         pcols: list, kd: str) -> DataFrame:
    """Insert zero-count buckets between each parent's min and max keys
    (tantivy histogram min_doc_count=0 semantics).  Works per parent in
    one pass: span agg → key sequence explode → left join counts.  The
    bucket-count guardrail raises distributed (no driver collect)."""
    from sparksearch.config import CONFIG
    maxb = F.lit(int(CONFIG.max_agg_buckets))
    span = g.groupBy(*pcols).agg(F.min(kd).alias("__lo"),
                                 F.max(kd).alias("__hi"))
    if kind == "histogram":
        interval = float(opts["interval"])
        off = float(opts.get("offset", 0))
        lo = ((F.col("__lo") - off) / interval).cast("long")
        hi = ((F.col("__hi") - off) / interval).cast("long")
        key_of = lambda o: (o * interval + off).cast("double")  # noqa: E731
    elif "calendar_interval" in opts:
        unit = _CAL.get(opts["calendar_interval"], "day")
        step = F.expr(f"interval 1 {unit}")
        seq = F.sequence(F.col("__lo"), F.col("__hi"), step)
        seq = F.when(F.size(seq) > maxb, F.raise_error(F.concat(
            F.lit("max_agg_buckets exceeded while gap-filling: "),
            F.size(seq).cast("string")))).otherwise(seq)
        full = span.select(*pcols, F.explode(seq).alias(kd))
        return full.join(g, pcols + [kd], "left").fillna({"doc_count": 0})
    else:
        ms = _fixed_interval_ms(opts["fixed_interval"])
        lo = (F.unix_millis(F.col("__lo")) / ms).cast("long")
        hi = (F.unix_millis(F.col("__hi")) / ms).cast("long")
        key_of = lambda o: F.timestamp_millis(o * ms)  # noqa: E731
    n = hi - lo + F.lit(1)
    seq = F.when(n > maxb, F.raise_error(F.concat(
        F.lit("max_agg_buckets exceeded while gap-filling: "),
        n.cast("string")))).otherwise(F.sequence(lo, hi))
    full = (span.select(*pcols, F.explode(seq).alias("__o"))
            .select(*pcols, key_of(F.col("__o")).alias(kd)))
    return full.join(g, pcols + [kd], "left").fillna({"doc_count": 0})


def _fill_range_buckets(g: DataFrame, opts: dict, pcols: list,
                        kd: str, src: DataFrame) -> DataFrame:
    """Left-join the DEFINED range bucket list so zero-count ranges
    appear, carrying a definition ordinal for output order.

    Parent keys come from ``src`` (the level's INPUT frame), not the
    grouped frame: a parent bucket whose docs all fall outside every
    defined range has zero rows in ``g`` but must still emit all its
    defined buckets with doc_count 0."""
    keys = []
    for i, b in enumerate(opts["ranges"]):
        frm, to = b.get("from"), b.get("to")
        key = b.get("key") or (f"{frm if frm is not None else '*'}"
                               f"-{to if to is not None else '*'}")
        keys.append((i, key))
    spark = g.sparkSession
    defined = spark.createDataFrame(keys, f"__rord int, {kd} string")
    parents = src.select(*pcols).distinct() if pcols else None
    full = (parents.crossJoin(defined) if parents is not None
            else defined)
    return full.join(g, pcols + [kd], "left").fillna({"doc_count": 0})


def _fill_filter_buckets(g: DataFrame, opts: dict, pcols: list,
                         kd: str, src: DataFrame) -> DataFrame:
    """Left-join the DEFINED filter-name list so zero-count named
    buckets appear (doc_count 0, NULL metrics), mirroring the SQL
    ``COUNT(*) FILTER (WHERE ...)`` twin that returns 0 for a no-match
    predicate.  Parent keys come from ``src`` for the same reason as
    :func:`_fill_range_buckets` — a parent whose docs match NO filter
    still emits every named bucket at 0."""
    spark = g.sparkSession
    defined = spark.createDataFrame([(n,) for n in opts["filters"]],
                                    f"{kd} string")
    parents = src.select(*pcols).distinct() if pcols else None
    full = (parents.crossJoin(defined) if parents is not None
            else defined)
    return full.join(g, pcols + [kd], "left").fillna({"doc_count": 0})


def _bucket_level(df: DataFrame, spec: dict, pcols: list,
                  schema=None) -> dict:
    """Compile one bucket level for ALL parent buckets at once.

    ``df`` carries the parent key columns ``__k0..__k{d-1}`` already
    filtered to the kept parent buckets; this level groups by
    (parents..., this key) in ONE multi-key groupBy — a single Exchange
    per nesting level regardless of bucket counts (reference:
    aggregatescan/build.rs:185-190 nested aggs).  Returns
    {parent_key_tuple: envelope dict} where the envelope is
    ``{"buckets": [...]}`` plus, for terms, the ES accounting fields
    ``sum_other_doc_count`` (docs in buckets beyond the size cap —
    computed from a window sum over the GROUPED frame, whose cardinality
    is the distinct-key count, not the doc count) and
    ``doc_count_error_upper_bound`` (always 0 — the groupBy is exact,
    unlike ES's sharded approximation; matches the reference's
    agg-bool-terms.out which also reports 0).
    """
    kind, key_col, opts = _bucket_expr(spec, df, schema=schema)
    kd = f"__k{len(pcols)}"
    sub = spec.get("aggs", {})
    metric_exprs, sub_buckets, top_hits = [], {}, {}
    for sname, sspec in sub.items():
        if _is_metric(sspec):
            metric_exprs += _metric_exprs(sname, sspec, df,
                                          schema=schema)
        elif _is_top_hits(sspec):
            top_hits[sname] = sspec
        else:
            sub_buckets[sname] = sspec

    if kind == "filters":
        # one row per (doc, matching bucket): docs in several buckets
        # count in each; docs matching none drop out with the explode
        keyed = df.withColumn(kd, F.explode(key_col))
    else:
        keyed = df.withColumn(kd, key_col)
        if kind == "range":
            keyed = keyed.filter(F.col(kd).isNotNull())
    agg_exprs = [F.count("*").alias("doc_count")]
    for alias, e in metric_exprs:
        agg_exprs.append(e.alias(alias))
    g = keyed.groupBy(*pcols, kd).agg(*agg_exprs)

    min_dc = opts.get("min_doc_count", 0 if kind != "terms" else 1)
    if min_dc:
        g = g.filter(F.col("doc_count") >= min_dc)
    elif kind in ("histogram", "date_histogram"):
        # tantivy emits EVERY bucket between the min and max keys with
        # doc_count 0 when min_doc_count is 0 — its histogram default
        # (custom-agg.out Test 14: interval-100 histogram over values
        # 0..10000 prints 101 buckets, 96 of them empty)
        g = _fill_histogram_gaps(g, kind, opts, pcols, kd)
    elif kind == "range":
        # tantivy/ES range aggs return every DEFINED bucket, zero-count
        # included, in definition order (custom-agg.out Test 13)
        g = _fill_range_buckets(g, opts, pcols, kd, df)
    elif kind == "filters":
        # every NAMED filter yields a bucket even with zero matches —
        # the SQL twin COUNT(*) FILTER (WHERE ...) returns 0, never
        # drops the column (groupby_filter_mixed_buckets.out), and ES
        # keyed filters always emit all names
        g = _fill_filter_buckets(g, opts, pcols, kd, df)
    if kind == "terms":
        order = opts.get("order", {"_count": "desc"})
        ((ofield, odir),) = order.items()
        oc = (F.col("doc_count") if ofield == "_count"
              else F.col(kd) if ofield == "_key" else F.col(ofield))
        # PG ORDER BY null placement (ASC→NULLS LAST, DESC→NULLS FIRST):
        # a size-truncated ordered prefix must cut the same groups the
        # reference's pushdown cuts, so a NULL group may not jump the
        # queue (groupby_aggregate_highcard.out LIMIT 5 OFFSET 5 = 6..10)
        oc = oc.desc_nulls_first() if odir == "desc" else oc.asc_nulls_last()
        from sparksearch.config import CONFIG
        size = int(opts.get("size", CONFIG.terms_agg_default_size))
        # per-parent doc total over the grouped frame (cardinality =
        # distinct keys) — feeds sum_other_doc_count
        g = g.withColumn("__lvl_total",
                         F.sum("doc_count").over(W.partitionBy(*pcols)))
        if pcols:
            # per-parent top-size buckets in one ranking window
            w = W.partitionBy(*pcols).orderBy(oc, F.col(kd).asc_nulls_last())
            g = (g.withColumn("__rn", F.row_number().over(w))
                 .filter(F.col("__rn") <= size).drop("__rn"))
            g = g.orderBy(*pcols, oc, F.col(kd).asc_nulls_last())
        else:
            g = g.orderBy(oc, F.col(kd).asc_nulls_last()).limit(size)
    else:
        ordc = (F.col("__rord") if "__rord" in g.columns
                else F.col(kd).asc())
        g = g.orderBy(*pcols, ordc)

    # driver-OOM guardrail: the envelope is assembled driver-side, so a
    # bucket level may never collect unboundedly — abort loudly past the
    # cap instead of silently truncating or OOMing (reference:
    # api/aggregate.rs:74-108 bucket_limit; Tantivy AggregationLimits
    # "Aborting aggregation because too many buckets were created").
    from sparksearch.config import CONFIG
    cap = CONFIG.max_agg_buckets
    try:
        rows = g.limit(cap + 1).collect() if cap else g.collect()
    except Exception as exc:  # executor-side gap-fill guardrail marker
        if "max_agg_buckets exceeded" in str(exc):
            raise AggBucketLimitError(
                f"aggregation level {kind!r} produced more than "
                f"max_agg_buckets={cap} buckets; raise "
                "sparksearch.config.set(max_agg_buckets=...) or narrow "
                "the aggregation (size / ranges / interval)") from None
        raise
    if cap and len(rows) > cap:
        raise AggBucketLimitError(
            f"aggregation level {kind!r} produced more than "
            f"max_agg_buckets={cap} buckets; raise "
            "sparksearch.config.set(max_agg_buckets=...) or narrow the "
            "aggregation (size / ranges / interval)")

    # children: ONE filtered frame for all kept buckets of this level
    child_by_parent: dict = {}
    th_by_parent: dict = {}
    if sub_buckets or top_hits:
        kept = [tuple(r[p] for p in pcols) + (r[kd],) for r in rows]
        if len(pcols) == 0:
            child = keyed.filter(F.col(kd).isin([k[-1] for k in kept]))
        else:
            spark = keyed.sparkSession
            kdf = spark.createDataFrame(kept, keyed.select(*pcols, kd).schema)
            child = keyed.join(F.broadcast(kdf), on=pcols + [kd], how="left_semi")
        for sname, sspec in sub_buckets.items():
            child_by_parent[sname] = _bucket_level(child, sspec,
                                                    pcols + [kd],
                                                    schema=schema)
        for sname, sspec in top_hits.items():
            th_by_parent[sname] = _top_hits_level(child, sspec, pcols + [kd])

    from pyspark.sql.types import BooleanType
    key_is_bool = isinstance(keyed.schema[kd].dataType, BooleanType)
    out: dict = {}
    totals: dict = {}
    for r in rows:
        ptuple = tuple(r[p] for p in pcols)
        full = ptuple + (r[kd],)
        if key_is_bool and r[kd] is not None:
            # reference agg-bool-terms.out: boolean keys render 0/1 with
            # key_as_string "false"/"true"
            b = {"key": int(r[kd]), "doc_count": r["doc_count"],
                 "key_as_string": "true" if r[kd] else "false"}
        elif kind == "date_histogram" and r[kd] is not None:
            # reference datetime_stability.out: date_histogram bucket
            # keys are PG-epoch MICROSECONDS (float) with a UTC
            # second-precision key_as_string — the stable envelope the
            # i64-pg-micros storage transition locked in
            import datetime as _dt
            ts = r[kd]
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=_dt.timezone.utc)
            pg_us = (ts.timestamp() - 946684800.0) * 1_000_000
            b = {"key": float(pg_us), "doc_count": r["doc_count"],
                 "key_as_string": ts.astimezone(_dt.timezone.utc)
                 .strftime("%Y-%m-%dT%H:%M:%SZ")}
        else:
            b = {"key": _jval(r[kd]), "doc_count": r["doc_count"]}
        d = r.asDict()
        if kind == "terms":
            totals[ptuple] = d["__lvl_total"]
        for alias, _ in metric_exprs:
            if "." in alias:
                top, leaf = alias.split(".", 1)
                b.setdefault(top, {})[leaf] = _jval(d[alias])
            else:
                b[alias] = {"value": _jval(d[alias])}
        for sname, by_p in child_by_parent.items():
            b[sname] = by_p.get(full, _empty_envelope(sub_buckets[sname]))
        for sname, by_p in th_by_parent.items():
            b[sname] = {"hits": by_p.get(full, [])}
        out.setdefault(ptuple, []).append(b)
    env: dict = {}
    for ptuple, bl in out.items():
        e = {"buckets": bl}
        if kind == "terms":
            e["sum_other_doc_count"] = int(
                totals[ptuple] - sum(x["doc_count"] for x in bl))
            e["doc_count_error_upper_bound"] = 0
        env[ptuple] = e
    return env


def _jval(v):
    import datetime as dt
    import decimal
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def _warn_agg_scan(reason: str, table_name: str) -> None:
    from sparksearch import config as _cfg
    if not _cfg.CONFIG.check_aggregate_scan:
        return
    import warnings
    warnings.warn(
        f"Aggregate Scan not used: {reason}. To disable this warning: "
        f"SET paradedb.check_aggregate_scan = false (table: {table_name})",
        stacklevel=3)


_IDENT = None  # compiled lazily


def count_aggregate_spec(index, arg: str) -> dict | None:
    """Translate a SQL ``COUNT(<arg>)`` argument into the pushable
    value_count spec, or warn and return None for the heap-fallback
    path (reference aggregatescan/aggregate_type.rs:568-585
    parse_aggregate_field + parse_coalesce_expression; warning text
    and fallback behavior pinned by issue_3196.out).

    Pushable forms: ``*`` (count over the key, the ctid analog), a
    direct column reference, and ``COALESCE(col, const)`` (const
    becomes the ES ``missing`` value, so NULLs count).  A JSON
    projection or any other expression is not a Var → warning +
    None; COALESCE whose first argument isn't a plain column or whose
    second isn't a constant warns with the reference's specific text.
    """
    import re
    global _IDENT
    if _IDENT is None:
        _IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
    tname = getattr(index, "table_name", "") or "?"
    arg = arg.strip()
    if arg == "*":
        return {"value_count": {"field": index.schema.key_field}}
    m = re.match(r"(?is)^coalesce\s*\((.*)\)$", arg)
    if m:
        parts = [p.strip() for p in m.group(1).split(",")]
        if len(parts) < 2 or not _IDENT.match(parts[0]):
            _warn_agg_scan("first argument of COALESCE must resolve "
                           "to a variable", tname)
            return None
        try:
            missing = float(parts[1])
        except ValueError:
            _warn_agg_scan("second argument of COALESCE must resolve "
                           "to a constant", tname)
            return None
        return {"value_count": {"field": parts[0], "missing": missing}}
    if _IDENT.match(arg):
        return {"value_count": {"field": arg}}
    _warn_agg_scan("argument to aggregate function is neither a direct "
                   "column reference nor a COALESCE expression", tname)
    return None


_PUSHABLE_AGG_FNS = {"count": "value_count", "sum": "sum", "avg": "avg",
                     "min": "min", "max": "max"}


def sql_aggregate_spec(index, fn: str, arg: str,
                       distinct: bool = False) -> dict | None:
    """Translate ``<fn>(<arg>)`` into the pushable ES metric spec —
    count/sum/avg/min/max only, like the reference's
    AggregateType::try_from OID whitelist (aggregate_type.rs:635-680);
    any other function warns ``unsupported aggregate function: <fn>``
    (issue_4906_ltree_op_absent.out's array_agg) and returns None for
    the heap-fallback path.  ``distinct`` aggregates (COUNT(DISTINCT
    ...) etc.) never push down — the reference warns ``DISTINCT is not
    supported`` (groupby_aggregate.out SECTION 5) and falls back to
    the native plan, which returns the same rows."""
    if distinct:
        _warn_agg_scan(
            "DISTINCT is not supported (see "
            "https://github.com/paradedb/paradedb/issues/new/choose)",
            getattr(index, "table_name", "") or "?")
        return None
    kind = _PUSHABLE_AGG_FNS.get(fn.lower())
    if kind is None:
        _warn_agg_scan(f"unsupported aggregate function: {fn}",
                       getattr(index, "table_name", "") or "?")
        return None
    spec = count_aggregate_spec(index, arg)
    if spec is None:
        return None
    if kind != "value_count":
        spec = {kind: spec["value_count"]}
    return spec


def grouping_columns(index, group_by: list) -> list:
    """The grouping columns the aggregate scan sees AFTER Postgres's
    functional-dependency elimination: when the key field (the PK) is
    in GROUP BY, every other plain column reference is functionally
    dependent on it and is dropped — but expressions (JSON paths etc.)
    survive, since remove_useless_groupby_columns only elides Vars.
    (issue_3050.out: GROUP BY id, rating reduces to [id]; GROUP BY id,
    metadata->>'color' keeps the JSON path.)"""
    import re
    if index.schema.key_field not in group_by:
        return list(group_by)
    ident = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
    return [g for g in group_by
            if g == index.schema.key_field or not ident.match(g)]


_KEYWORD_FAMILY = ("keyword", "raw", "literal", "literal_normalized",
                   "datetime", "inet")


def check_grouping_columns(index, group_by: list) -> bool:
    """Eligibility of each GROUP BY column for the index aggregate scan
    (issue_3827.out): a TOKENIZED text field's fast data is its tokens,
    not the raw value, so grouping on it warns ``grouping column X
    exists, but is not a fast field``; a column not in the index at all
    warns ``grouping column X is missing from index``.  Keyword-family
    text fields, the key, declared numeric/boolean fields, and JSON
    paths group fine.  Returns False (after warning) on the first
    ineligible column — the caller falls back to the plain groupBy
    plan, which returns the same rows."""
    tname = getattr(index, "table_name", "") or "?"
    schema = index.schema
    for g in group_by:
        if g == schema.key_field or g in schema.indexed_attr_fields():
            continue
        if "." in g:   # JSON path — json fields are fast
            continue
        try:
            cfg = schema.field(g)
        except (KeyError, ValueError):
            _warn_agg_scan(f"grouping column {g} is missing from index",
                           tname)
            return False
        if cfg.tokenizer not in _KEYWORD_FAMILY:
            _warn_agg_scan(f"grouping column {g} exists, but is not a "
                           "fast field", tname)
            return False
    return True


def check_grouped_targets(index, select_fields: list,
                          group_by: list) -> bool:
    """The aggregate scan's target-list check (aggregatescan/
    targetlist.rs:221-236): every non-aggregate select field must be
    one of the grouping columns that SURVIVED functional-dependency
    elimination; otherwise warn ``Field 'X' is not a grouping column``
    (issue_3050.out) and return False → the caller falls back to the
    plain groupBy plan, which returns the same rows."""
    gcols = grouping_columns(index, group_by)
    tname = getattr(index, "table_name", "") or "?"
    for f in select_fields:
        if f not in gcols:
            _warn_agg_scan(f"Field '{f}' is not a grouping column", tname)
            return False
    return True


def search_aggregate(index, query, aggs) -> dict:
    """reference ``paradedb.aggregate(index, query, agg)``: run the search,
    aggregate over matching docs."""
    from sparksearch.query.compiler import compile_query
    from sparksearch.query.search import _as_query
    matches = compile_query(index, _as_query(index, query)).select("doc_id")
    key = index.schema.key_field
    docs = index.docs.join(matches, index.docs[key] == matches["doc_id"],
                           "left_semi")
    return run_aggs(docs, aggs, schema=index.schema)
