"""BM25: formula parity with a reference implementation, top-k order."""

import math

import pytest

from go_muse_spark.operators.terms import bm25_topk


DOCS = [
    (0, "spark join hash join merge"),
    (1, "join the table with a hash join and a hash map"),
    (2, "scan filter scan filter scan"),
    (3, "hash"),
    (4, "join join join join join join join join"),
]


def _ref_scores(query, k1=1.2, b=0.75):
    n = len(DOCS)
    toks = {i: t.split(" ") for i, t in DOCS}
    dl = {i: len(v) for i, v in toks.items()}
    total = sum(dl.values())
    out = {}
    for i in toks:
        s, hits = 0.0, 0
        for q in sorted(set(query)):
            tf = toks[i].count(q)
            if tf == 0:
                continue
            df = sum(1 for j in toks if q in toks[j])
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * dl[i] * n / total)
            )
            hits += 1
        if hits:
            out[i] = (hits, s)
    return out


def test_bm25_matches_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = ("hash", "join")
    got = {
        r["doc_id"]: (r["n_hit"], r["score"])
        for r in bm25_topk(df, q, n_docs=len(DOCS), k=10).collect()
    }
    ref = _ref_scores(q)
    assert set(got) == set(ref)
    for i in ref:
        assert got[i][0] == ref[i][0]
        assert got[i][1] == pytest.approx(ref[i][1], rel=1e-12)


def test_bm25_topk_order_and_limit(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = bm25_topk(df, ("join",), n_docs=len(DOCS), k=2).collect()
    ref = _ref_scores(("join",))
    order = sorted(ref, key=lambda i: (-ref[i][1], i))[:2]
    assert [r["doc_id"] for r in rows] == order


def test_bm25_saturation_beats_raw_tf(spark):
    # doc 4 spams 'join' 8x but is long; doc 0 has it twice in a
    # 5-token doc. BM25 must not rank by raw tf alone: the ratio of
    # scores stays far below 8/2.
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(df, ("join",), n_docs=len(DOCS), k=10).collect()
    }
    assert got[4] / got[0] < 2.0


def test_bm25_needs_terms(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, (), n_docs=5)
