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
