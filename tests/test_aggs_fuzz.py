"""Differential fuzzing of the ES-style aggregation DSL.

Seeded random agg requests (terms / histogram / range / filters buckets,
nested sub-buckets, metric leaves) run through sparksearch.aggs.run_aggs
on the mock_items corpus and are re-evaluated by an INDEPENDENT pandas
oracle below.  Complements the fixed-shape oracle contract entries and
golden ports with randomized coverage of bucket ordering, gap filling,
zero-count range buckets, nesting, and metric placement.

Envelope semantics mirrored by the oracle (all reference-pinned
elsewhere): terms order = doc_count desc then key asc, size-truncated,
sum_other_doc_count accounting; histogram min_doc_count=0 gap-fills
between the min and max keys (tantivy default) with NULL metrics in
empty buckets; range buckets appear in definition order zero-count
included; filters buckets are non-exclusive and keyed by name asc;
boolean terms keys render int + key_as_string.
"""

import math
import random

import pytest

from sparksearch.aggs import run_aggs
from sparksearch.fixtures import mock_items_pdf

METRIC_FIELDS = ["rating", "id"]
CATS = ["Electronics", "Footwear", "Books"]


def gen_metric(rng: random.Random) -> dict:
    kind = rng.choice(["value_count", "sum", "avg", "min", "max", "stats"])
    return {kind: {"field": rng.choice(METRIC_FIELDS)}}


def gen_bucket(rng: random.Random, depth: int = 0) -> dict:
    kind = rng.choice(["terms", "terms", "histogram", "range", "filters"])
    if kind == "terms":
        spec = {"terms": {"field": rng.choice(["category", "in_stock",
                                               "rating"]),
                          "size": rng.choice([2, 3, 50])}}
    elif kind == "histogram":
        spec = {"histogram": {"field": "rating",
                              "interval": rng.choice([1, 2]),
                              "offset": rng.choice([0, 0, 1])}}
    elif kind == "range":
        edges = sorted(rng.sample([1, 2, 3, 4, 5], rng.randint(1, 3)))
        ranges, prev = [], None
        for e in edges:
            ranges.append({"key": f"r{prev}_{e}", "to": e}
                          if prev is None else
                          {"key": f"r{prev}_{e}", "from": prev, "to": e})
            prev = e
        ranges.append({"key": f"r{prev}_end", "from": prev})
        spec = {"range": {"field": "rating", "ranges": ranges}}
    else:
        conds = {
            "elec": {"term": {"category": "Electronics"}},
            "instock": {"term": {"in_stock": True}},
            "mid": {"range": {"rating": {"gte": 2, "lte": 4}}},
            "all": {"match_all": {}},
            "none": {"term": {"category": "zzz_no_such"}},
        }
        names = rng.sample(sorted(conds), rng.randint(2, 3))
        spec = {"filters": {"filters": {n: conds[n] for n in names}}}
    subs = {}
    if rng.random() < 0.7:
        subs["m0"] = gen_metric(rng)
    if depth <= 1 and rng.random() < 0.4:
        subs["b0"] = gen_bucket(rng, depth=depth + 1)
    if subs:
        spec["aggs"] = subs
    return spec


# --------------------------- pandas oracle ----------------------------------

def _metric_vals(rows, spec: dict) -> dict:
    ((kind, body),) = spec.items()
    s = rows[body["field"]]
    if rows.empty:
        # engine gap-fill/left-join semantics: empty bucket → NULL metrics
        return {kind: None}
    if kind == "value_count":
        return {"value": float(s.count())}
    if kind == "sum":
        return {"value": int(s.sum())}
    if kind == "avg":
        return {"value": float(s.mean())}
    if kind == "min":
        return {"value": int(s.min())}
    if kind == "max":
        return {"value": int(s.max())}
    if kind == "stats":
        return {"count": int(s.count()), "min": int(s.min()),
                "max": int(s.max()), "avg": float(s.mean()),
                "sum": int(s.sum())}
    raise AssertionError(kind)


def eval_bucket(pdf, spec: dict):
    """→ list of (key, doc_count, bucket_rows) in engine output order."""
    if "terms" in spec:
        t = spec["terms"]
        size = t["size"]
        groups = sorted(pdf.groupby(t["field"], sort=False).groups.items(),
                        key=lambda kv: (-len(kv[1]), kv[0]))
        return [(k, pdf.loc[ix]) for k, ix in groups[:size]]
    if "histogram" in spec:
        h = spec["histogram"]
        iv, off = float(h["interval"]), float(h.get("offset", 0))
        keys = pdf[h["field"]].map(
            lambda x: math.floor((x - off) / iv) * iv + off)
        lo, hi = keys.min(), keys.max()
        out, k = [], lo
        while k <= hi + 1e-9:
            out.append((float(k), pdf[keys == k]))
            k += iv
        return out
    if "range" in spec:
        r = spec["range"]
        out = []
        for b in r["ranges"]:
            if pdf.empty:
                # .map over an empty Series yields object dtype, which
                # pandas would treat as a column indexer — short-circuit
                out.append((b["key"], pdf))
                continue
            m = pdf[r["field"]].map(lambda x: (
                (b.get("from") is None or x >= b["from"])
                and (b.get("to") is None or x < b["to"])))
            out.append((b["key"], pdf[m]))
        return out
    if "filters" in spec:
        conds = spec["filters"]["filters"]

        def match(cond, row):
            if "term" in cond:
                ((f, v),) = cond["term"].items()
                return row[f] == v
            if "range" in cond:
                ((f, bnds),) = cond["range"].items()
                x = row[f]
                return all((x >= v if op == "gte" else x > v if op == "gt"
                            else x <= v if op == "lte" else x < v)
                           for op, v in bnds.items())
            return True  # match_all
        out = []
        for name in sorted(conds):
            if pdf.empty:
                out.append((name, pdf))
                continue
            m = pdf.apply(lambda r: match(conds[name], r), axis=1)
            # zero-count named buckets included (COUNT FILTER twin = 0)
            out.append((name, pdf[m]))
        return out
    raise AssertionError(list(spec))


def check_level(env: dict, pdf, spec: dict, path: str):
    want = eval_bucket(pdf, spec)
    got = env["buckets"]
    assert len(got) == len(want), \
        f"{path}: {len(got)} buckets vs {len(want)}"
    if "terms" in spec:
        total = len(pdf.dropna(subset=[spec["terms"]["field"]]))
        kept = sum(len(rows) for _, rows in want)
        assert env["sum_other_doc_count"] == total - kept, path
    for b, (key, rows) in zip(got, want):
        gkey = b["key"]
        if isinstance(key, bool):
            assert gkey == int(key) and \
                b["key_as_string"] == str(key).lower(), (path, gkey, key)
        elif isinstance(key, float):
            assert float(gkey) == pytest.approx(key), (path, gkey, key)
        else:
            assert gkey == key, (path, gkey, key)
        assert b["doc_count"] == len(rows), (path, key,
                                             b["doc_count"], len(rows))
        for sname, sspec in spec.get("aggs", {}).items():
            if any(k in sspec for k in ("terms", "histogram", "range",
                                        "filters")):
                # empty parents included: a zero-count bucket still
                # emits every DEFINED range/filter sub-bucket at 0
                check_level(b[sname], rows, sspec, f"{path}/{key}")
                continue
            wantm = _metric_vals(rows, sspec)
            gotm = b[sname]
            if rows.empty:
                assert all(v is None for v in gotm.values()), (path, gotm)
                continue
            for mk, mv in wantm.items():
                gv = gotm[mk]
                if isinstance(mv, float):
                    assert gv == pytest.approx(mv), (path, key, mk, gv, mv)
                else:
                    assert gv == mv, (path, key, mk, gv, mv)


@pytest.fixture(scope="module")
def docs(spark):
    from sparksearch.fixtures import mock_items
    return mock_items(spark).cache()


@pytest.mark.parametrize("seed", range(25))
def test_random_aggs_match_pandas_oracle(docs, seed):
    rng = random.Random(4000 + seed)
    spec = {"a0": gen_bucket(rng)}
    env = run_aggs(docs, spec)["aggregations"]["a0"]
    check_level(env, mock_items_pdf(), spec["a0"], f"seed{seed}")
