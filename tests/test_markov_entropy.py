"""markov_entropy: reference parity, Gibbs gain >= 0, degenerate chains."""

import datetime as dt
import math

import pytest

from go_muse_spark.operators.timeweight import markov_entropy


def _df(spark, seqs):
    rows = []
    for u, states in seqs.items():
        for i, s in enumerate(states):
            rows.append((u, dt.datetime(2025, 1, 1) + dt.timedelta(minutes=i), s))
    return spark.createDataFrame(rows, "user_id string, ts timestamp, st string")


def _ref(seqs):
    # replicate: compact consecutive repeats per user, drop series starts
    pairs = []
    for states in seqs.values():
        comp = [states[0]]
        for s in states[1:]:
            if s != comp[-1]:
                comp.append(s)
        pairs += list(zip(comp, comp[1:]))
    n = len(pairs)
    from collections import Counter

    cnt = Counter(pairs)
    nf = Counter(p[0] for p in pairs)
    nm = Counter(p[1] for p in pairs)
    h_cond = -sum(
        (c / n) * math.log(c / nf[f]) for (f, t), c in sorted(cnt.items())
    )
    h_marg = -sum((c / n) * math.log(c / n) for t, c in sorted(nm.items()))
    return n, h_cond, h_marg


def test_matches_reference(spark):
    seqs = {
        "u1": list("ababcabcaab"),
        "u2": list("aaabbbcccab"),
        "u3": list("cacacacacac"),
    }
    row = markov_entropy(_df(spark, seqs), "st").collect()[0]
    n, hc, hm = _ref(seqs)
    assert row["n_transitions"] == n
    assert row["h_cond_u"] == round(hc * 1e6)
    assert row["h_marg_u"] == round(hm * 1e6)
    assert row["info_gain_u"] == round((hm - hc) * 1e6)
    assert row["info_gain_u"] >= 0  # Gibbs


def test_deterministic_chain_zero_cond_entropy(spark):
    # a->b->a->b...: next state fully determined by previous
    seqs = {"u": list("abababababab")}
    row = markov_entropy(_df(spark, seqs), "st").collect()[0]
    assert row["h_cond_u"] == 0
    # marginal ~ uniform over 2 states (6/11, 5/11) -> near ln 2
    _, _, hm = _ref(seqs)
    assert row["h_marg_u"] == round(hm * 1e6)
    assert abs(hm - math.log(2)) < 0.01
    assert row["info_gain_u"] == row["h_marg_u"]


def _ref_memory(seqs):
    from collections import Counter

    tris = []
    for states in seqs.values():
        comp = [states[0]]
        for s in states[1:]:
            if s != comp[-1]:
                comp.append(s)
        tris += list(zip(comp, comp[1:], comp[2:]))
    n = len(tris)
    c3 = Counter(tris)
    c2ctx = Counter((a, b) for a, b, _ in tris)
    c2 = Counter((b, c) for _, b, c in tris)
    c1ctx = Counter(b for _, b, _ in tris)
    h2 = -sum(
        (v / n) * math.log(v / c2ctx[(a, b)])
        for (a, b, c), v in sorted(c3.items())
    )
    h1 = -sum(
        (v / n) * math.log(v / c1ctx[b])
        for (b, c), v in sorted(c2.items())
    )
    return n, h1, h2


def test_markov_memory_matches_reference(spark):
    from go_muse_spark.operators.timeweight import markov_memory

    seqs = {
        "u1": list("abcabcabcabca"),
        "u2": list("abacabadabacabad"),
        "u3": list("cabcabcabc"),
    }
    row = markov_memory(_df(spark, seqs), "st").collect()[0]
    n, h1, h2 = _ref_memory(seqs)
    assert row["n_transitions"] == n
    assert row["h1_u"] == round(h1 * 1e6)
    assert row["h2_u"] == round(h2 * 1e6)
    assert row["gain2_u"] == round((h1 - h2) * 1e6)
    assert row["gain2_u"] >= 0  # Gibbs on common support
    # u2's pattern needs 2-state memory (aba->c vs aba->d context) ->
    # real positive gain
    assert row["gain2_u"] > 50_000


def test_markov_memory_order1_chain_zero_gain(spark):
    from go_muse_spark.operators.timeweight import markov_memory

    # strict cycle: next state fully determined by ONE previous state
    seqs = {"u": list("abcabcabcabcabc")}
    row = markov_memory(_df(spark, seqs), "st").collect()[0]
    assert row["h2_u"] == 0 and row["h1_u"] == 0 and row["gain2_u"] == 0
