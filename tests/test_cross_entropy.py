"""cross_entropy_matrix vs a hand-rolled smoothed-unigram reference."""

import math

import pytest

from go_muse_spark.operators.terms import cross_entropy_matrix

DOCS = [
    (0, "A", "spark join table spark window"),
    (1, "A", "spark agg window join"),
    (2, "B", "scan filter scan table filter"),
    (3, "B", "filter scan scan"),
]


def _ref():
    from collections import Counter

    tf = {}
    for _, s, t in DOCS:
        tf.setdefault(s, Counter()).update(t.split())
    vocab = {w for c in tf.values() for w in c}
    v = len(vocab)
    tot = {s: sum(c.values()) for s, c in tf.items()}
    out = {}
    for a in tf:  # model
        for b in tf:  # data
            h = -sum(
                (nb / tot[b])
                * math.log((tf[a].get(t, 0) + 1) / (tot[a] + v))
                for t, nb in sorted(tf[b].items())
            )
            out[(a, b)] = h
    return out


def test_matches_reference_and_diagonal_zero_kl(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, source string, text string")
    got = {
        (r["model_src"], r["data_src"]): r
        for r in cross_entropy_matrix(df, "source").collect()
    }
    ref = _ref()
    assert set(got) == set(ref)
    for k in ref:
        assert got[k]["h_cross_u"] == pytest.approx(
            round(ref[k] * 1e6), abs=1
        )
    # diagonal KL is exactly 0 by construction
    assert got[("A", "A")]["kl_u"] == 0 and got[("B", "B")]["kl_u"] == 0
    # off-diagonal: disjoint-ish vocabularies -> strongly positive KL
    assert got[("A", "B")]["kl_u"] > 500_000
    assert got[("B", "A")]["kl_u"] > 500_000


def test_mirror_slice_low_kl(spark):
    docs = DOCS + [(4, "C", "spark join table window agg spark")]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    got = {
        (r["model_src"], r["data_src"]): r["kl_u"]
        for r in cross_entropy_matrix(df, "source").collect()
    }
    # C speaks A's language: A's model is far less surprised by C
    # than B's model is
    assert got[("A", "C")] < got[("B", "C")]
