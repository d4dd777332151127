"""G^2 keyness: reference-formula parity, zero cells, sign."""

import math

import pytest

from go_muse_spark.operators.terms import keyness_topk

DOCS = [
    ("s1", "spark spark spark join table"),
    ("s1", "spark window agg"),
    ("s2", "table scan scan filter"),
    ("s2", "filter scan table join"),
]


def _ref_g2(a, b, na, nb):
    t = a + b
    s = 0.0
    if a > 0:
        s += a * math.log(a * (na + nb) / (t * na))
    if b > 0:
        s += b * math.log(b * (na + nb) / (t * nb))
    sign = 1.0 if a * nb >= b * na else -1.0
    return sign * 2.0 * s


def test_keyness_matches_reference(spark):
    df = spark.createDataFrame(DOCS, "source string, text string")
    rows = keyness_topk(df, "source", k=10).collect()
    # reference counts
    toks = {}
    for s, t in DOCS:
        for w in t.split():
            toks.setdefault(s, []).append(w)
    na = {s: len(v) for s, v in toks.items()}
    total = sum(na.values())
    for r in rows:
        s = r["source"]
        a = toks[s].count(r["term"])
        b = sum(v.count(r["term"]) for k, v in toks.items() if k != s)
        assert r["a"] == a and r["b"] == b
        assert r["na"] == na[s] and r["nb"] == total - na[s]
        assert r["g2"] == pytest.approx(
            _ref_g2(a, b, na[s], total - na[s]), rel=1e-12
        )


def test_keyness_top_terms_sensible(spark):
    df = spark.createDataFrame(DOCS, "source string, text string")
    rows = keyness_topk(df, "source", k=1).collect()
    top = {r["source"]: r["term"] for r in rows}
    # 'spark' is exclusive to s1, 'scan' to s2 — maximal keyness
    assert top["s1"] == "spark" and top["s2"] == "scan"


def test_keyness_only_overuse(spark):
    df = spark.createDataFrame(DOCS, "source string, text string")
    rows = keyness_topk(df, "source", k=50).collect()
    assert all(r["g2"] > 0 for r in rows)
    for r in rows:  # overuse: a/na > b/nb (cross-multiplied)
        assert r["a"] * r["nb"] >= r["b"] * r["na"]
