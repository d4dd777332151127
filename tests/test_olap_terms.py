"""dimensional_rollup / tfidf_top_terms: level semantics, grouping_id,
idf math vs numpy, plan shape."""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from go_muse_spark.operators.olap import dimensional_rollup
from go_muse_spark.operators.terms import tfidf_top_terms


def _ev(spark):
    rows = [
        ("click", "d1", 1.0),
        ("click", "d1", 2.0),
        ("click", "d2", 4.0),
        ("view", "d1", 8.0),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["etype", "day", "value"])
    )


def test_rollup_levels(spark):
    out = dimensional_rollup(
        _ev(spark), ("etype", "day"), {"n": F.count(F.lit(1)), "s": F.sum("value")}
    ).collect()
    got = {(r["etype"], r["day"], r["grp"]): (r["n"], r["s"]) for r in out}
    # leaf level (grp=0), per-type (grp=1, day NULL), total (grp=3)
    assert got[("click", "d1", 0)] == (2, 3.0)
    assert got[("click", "d2", 0)] == (1, 4.0)
    assert got[("view", "d1", 0)] == (1, 8.0)
    assert got[("click", None, 1)] == (3, 7.0)
    assert got[("view", None, 1)] == (1, 8.0)
    assert got[(None, None, 3)] == (4, 15.0)
    assert len(got) == 6  # rollup: no (None, day) slices


def test_cube_adds_day_slices(spark):
    out = dimensional_rollup(
        _ev(spark), ("etype", "day"), {"n": F.count(F.lit(1))}, cube=True
    ).collect()
    got = {(r["etype"], r["day"], r["grp"]): r["n"] for r in out}
    assert got[(None, "d1", 2)] == 3  # the slice rollup cannot produce
    assert got[(None, "d2", 2)] == 1
    assert len(got) == 8


def test_rollup_one_exchange(spark):
    plan = (
        dimensional_rollup(
            _ev(spark), ("etype", "day"), {"n": F.count(F.lit(1))}
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "Expand" in plan  # grouping-sets expansion, single scan


def test_tfidf_values_and_ranks(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            [
                (0, "apple banana apple"),
                (1, "banana cherry"),
                (2, "cherry cherry date"),
                (3, "apple"),
            ],
            columns=["doc_id", "text"],
        )
    )
    out = tfidf_top_terms(docs, n_docs=4, k=2).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: apple tf=2 df=2 idf=ln2 -> 2ln2 ; banana tf=1 df=2 -> ln2
    d0 = sorted(by_doc[0], key=lambda r: r["rnk"])
    assert [(r["term"], r["tf"], r["df"]) for r in d0] == [
        ("apple", 2, 2), ("banana", 1, 2),
    ]
    assert d0[0]["tfidf"] == pytest.approx(2 * math.log(2), abs=1e-12)
    # doc 1: banana and cherry both tf=1 df=2 -> tie broken by term asc
    d1 = sorted(by_doc[1], key=lambda r: r["rnk"])
    assert [r["term"] for r in d1] == ["banana", "cherry"]
    # every doc emits at most k rows
    assert all(len(v) <= 2 for v in by_doc.values())


def test_tfidf_no_python_in_plan(spark):
    docs = spark.createDataFrame(
        pd.DataFrame([(0, "a b")], columns=["doc_id", "text"])
    )
    plan = (
        tfidf_top_terms(docs, n_docs=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "ArrowEval" not in plan


# ------------------------------------------------- cardinality + histogram


def test_distinct_rollup_exact(spark, sf_dir):
    from go_muse_spark.operators.cardinality import distinct_rollup
    from go_muse_spark.sources.events import load_table

    ev = load_table(spark, sf_dir, "events")
    out = distinct_rollup(ev, "user_id", 86400, dims=("event_type",))
    rows = out.collect()
    # cross-check one cell against a direct filter
    r = rows[0]
    import pyspark.sql.functions as F

    cell = ev.filter(
        (F.unix_timestamp("ts") - F.unix_timestamp("ts") % 86400 == r["bucket_epoch"])
        & (F.col("event_type") == r["event_type"])
    )
    assert cell.count() == r["n_events"]
    assert cell.select("user_id").distinct().count() == r["n_distinct"]
    # totals conserve
    assert sum(x["n_events"] for x in rows) == ev.count()


def test_approx_distinct_within_tolerance(spark, sf_dir):
    from go_muse_spark.operators.cardinality import (
        approx_distinct_rollup,
        distinct_rollup,
    )
    from go_muse_spark.sources.events import load_table

    ev = load_table(spark, sf_dir, "events")
    exact = {
        (r["bucket_epoch"],): r["n_distinct"]
        for r in distinct_rollup(ev, "user_id", 86400).collect()
    }
    approx = {
        (r["bucket_epoch"],): r["n_approx"]
        for r in approx_distinct_rollup(ev, "user_id", 86400, rsd=0.05).collect()
    }
    assert set(exact) == set(approx)
    for k, e in exact.items():
        assert abs(approx[k] - e) <= max(2, 4 * 0.05 * e), (k, e, approx[k])


def test_value_histogram_clamps_and_conserves(spark):
    from go_muse_spark.operators.olap import value_histogram

    df = spark.createDataFrame(
        [("a", -5.0), ("a", 0.1), ("a", 0.9), ("a", 1.5), ("a", 99.0)],
        "g string, v double",
    )
    out = {r["bin_idx"]: r for r in value_histogram(df, "v", 0.0, 0.5, 4, dims=("g",)).collect()}
    # -5.0 clamps into bin 0 with 0.1; 0.9 -> bin 1; 1.5 -> bin 3 (exact
    # boundary, floor(3.0)=3); 99 clamps into bin 3
    assert out[0]["n"] == 2
    assert out[1]["n"] == 1
    assert out[3]["n"] == 2
    assert out[3]["bin_lo"] == 1.5
    assert sum(r["n"] for r in out.values()) == 5


def test_histogram_quantile_hand_fixture(spark):
    import pandas as pd

    from go_muse_spark.operators.olap import histogram_quantile

    # one dim "a": bins 0(n=4), 1(n=4), 3(n=2); total 10
    hist = spark.createDataFrame(
        pd.DataFrame(
            [("a", 0, 4), ("a", 1, 4), ("a", 3, 2)],
            columns=["g", "bin_idx", "n"],
        )
    )
    out = {
        r["q"]: r["qvalue"]
        for r in histogram_quantile(
            hist, (0.5, 0.9, 1.0), lo=0.0, width=10.0, dims=("g",)
        ).collect()
    }
    # q=0.5: target 5 -> bin 1 (cum 4<5<=8), 10 + 10*(5-4)/4 = 12.5
    assert out[0.5] == 12.5
    # q=0.9: target 9 -> bin 3 (cum 8<9<=10), 30 + 10*(9-8)/2 = 35
    assert out[0.9] == 35.0
    # q=1.0: target 10 -> last bin upper edge: 30 + 10*(10-8)/2 = 40
    assert out[1.0] == 40.0


def test_histogram_quantile_validates(spark):
    import pandas as pd
    import pytest

    from go_muse_spark.operators.olap import histogram_quantile

    hist = spark.createDataFrame(
        pd.DataFrame([("a", 0, 1)], columns=["g", "bin_idx", "n"])
    )
    with pytest.raises(ValueError):
        histogram_quantile(hist, (), lo=0.0, width=1.0, dims=("g",))
    with pytest.raises(ValueError):
        histogram_quantile(hist, (0.0,), lo=0.0, width=1.0, dims=("g",))
    with pytest.raises(ValueError):
        histogram_quantile(hist, (1.5,), lo=0.0, width=1.0, dims=("g",))


def test_ngram_diversity_ratio(spark):
    import pandas as pd

    from go_muse_spark.operators.terms import ngram_diversity

    docs = spark.createDataFrame(
        pd.DataFrame(
            [
                (1, "en", "a b c a b c"),       # 3-grams: abc bca cab abc
                (2, "en", "a b c"),             # abc
                (3, "fr", "x y"),               # too short -> none
            ],
            columns=["doc_id", "lang", "text"],
        )
    )
    out = {r["lang"]: r for r in ngram_diversity(docs, 3).collect()}
    en = out["en"]
    # instances: 4 + 1 = 5; distinct: "a b c","b c a","c a b" = 3
    assert en["n_total"] == 5 and en["n_distinct"] == 3
    assert abs(en["ttr"] - 0.6) < 1e-12
    assert "fr" not in out


def test_unigram_logprob_hand_fixture(spark):
    import math

    import pandas as pd

    from go_muse_spark.operators.terms import unigram_logprob

    docs = spark.createDataFrame(
        pd.DataFrame(
            [(1, "a a b"), (2, "a c")],
            columns=["doc_id", "text"],
        )
    )
    out = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    # corpus: a=3, b=1, c=1, total=5
    lp = lambda tf: math.log(tf / 5)
    d1 = (lp(3) + lp(3) + lp(1)) / 3
    d2 = (lp(3) + lp(1)) / 2
    assert out[1]["n_toks"] == 3 and abs(out[1]["logprob"] - d1) < 1e-12
    assert out[2]["n_toks"] == 2 and abs(out[2]["logprob"] - d2) < 1e-12


def test_histogram_quantile_random_parity(spark):
    """histogram_quantile == a python replay of the same interpolation
    on random histograms (including empty bins and single-bin dims)."""
    import random

    import pandas as pd

    from go_muse_spark.operators.olap import histogram_quantile

    rng = random.Random(5)
    rows = []
    for g in "abcd":
        bins = rng.sample(range(16), rng.randrange(1, 9))
        rows += [(g, b, rng.randrange(1, 50)) for b in sorted(bins)]
    hist = spark.createDataFrame(
        pd.DataFrame(rows, columns=["g", "bin_idx", "n"])
    )
    qs = (0.25, 0.5, 0.95)
    got = {
        (r["g"], r["q"]): r["qvalue"]
        for r in histogram_quantile(
            hist, qs, lo=0.0, width=8.0, dims=("g",)
        ).collect()
    }
    pdf = pd.DataFrame(rows, columns=["g", "bin_idx", "n"])
    for g, grp in pdf.groupby("g"):
        grp = grp.sort_values("bin_idx")
        tot = grp["n"].sum()
        for q in qs:
            target = q * tot
            cum = 0
            for _, r in grp.iterrows():
                prev = cum
                cum += r["n"]
                if cum >= target and prev < target:
                    expect = r["bin_idx"] * 8.0 + 8.0 * (target - prev) / r["n"]
                    assert abs(got[(g, q)] - expect) < 1e-9
                    break
    assert len(got) == 4 * len(qs)


def test_approx_quantile_within_tolerance(spark, sf_dir):
    import numpy as np
    import pandas as pd

    from go_muse_spark.operators.cardinality import approx_quantile_rollup
    from go_muse_spark.sources.events import load_table

    ev = load_table(spark, sf_dir, "events")
    got = {
        r["bucket_epoch"]: r
        for r in approx_quantile_rollup(
            ev, "value", (0.5, 0.9), 86400
        ).collect()
    }
    pdf = ev.select("ts", "value").toPandas()
    pdf["bucket"] = (
        pdf["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
    ) * 86400
    for b, g in pdf.groupby("bucket"):
        r = got[b]
        assert r["n"] == len(g)
        # GK rank error <= n/accuracy; translate to a value tolerance by
        # comparing against the exact values at rank +/- tol
        vals = np.sort(g["value"].to_numpy())
        for i, q in enumerate((0.5, 0.9)):
            tol = max(2, int(np.ceil(len(vals) / 10_000)) + 1)
            rank = int(np.ceil(q * len(vals))) - 1
            lo = vals[max(0, rank - tol)]
            hi = vals[min(len(vals) - 1, rank + tol)]
            assert lo <= r[f"q_{i}"] <= hi, (b, q, lo, r[f"q_{i}"], hi)


def test_approx_top_items_mg_bounds(spark, sf_dir):
    from collections import Counter

    from go_muse_spark.operators.cardinality import approx_top_items
    from go_muse_spark.sources.events import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("k")
    )
    truth = Counter(r["k"] for r in ev.collect())
    n = sum(truth.values())
    m = 32
    got = approx_top_items(ev, "k", m=m, out_k=10).collect()
    assert 0 < len(got) <= 10
    err = got[0]["err_ub"]
    assert all(r["err_ub"] == err for r in got)
    # merged-MG error: total decrement can reach ~N/(m+1) PER TASK
    # boundary, but never exceeds N
    assert 0 <= err <= n
    for r in got:
        true = truth[r["key"]]
        assert r["est"] <= true <= r["est"] + err, (r, true)
    # a skewed synthetic stream: the dominant key must surface with a
    # tight bracket even with tiny m
    rows = [(f"hot",) for _ in range(500)] + [(f"k{i}",) for i in range(400)]
    df = spark.createDataFrame(rows, "k string").repartition(4)
    top = approx_top_items(df, "k", m=8, out_k=1).collect()[0]
    assert top["key"] == "hot"
    assert top["est"] <= 500 <= top["est"] + top["err_ub"]
    with pytest.raises(ValueError):
        approx_top_items(df, "k", m=0)


def test_approx_top_items_ignores_null_keys(spark):
    from go_muse_spark.operators.cardinality import approx_top_items

    rows = [("hot",)] * 50 + [(None,)] * 200 + [("None",)] * 3
    df = spark.createDataFrame(rows, "k string").repartition(2)
    got = approx_top_items(df, "k", m=8, out_k=2).collect()
    assert got[0]["key"] == "hot"
    # the literal string "None" is its own key, never merged with NULLs
    lit = [r for r in got if r["key"] == "None"]
    assert not lit or lit[0]["est"] <= 3 + got[0]["err_ub"]


def test_rolling_distinct_wau_semantics(spark):
    from go_muse_spark.operators.cardinality import rolling_distinct

    # users active: day0 {a,b}, day1 {b}, day3 {c}; window = 3 days
    rows = [
        ("a", "1970-01-01 05:00:00"), ("b", "1970-01-01 09:00:00"),
        ("b", "1970-01-01 10:00:00"),  # same user twice in one day
        ("b", "1970-01-02 01:00:00"),
        ("c", "1970-01-04 01:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user string, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    got = {
        r["bucket_epoch"] // 86400: r["n_keys"]
        for r in rolling_distinct(ev, "user", 3).collect()
    }
    # anchor day0: {a,b}=2; day1: {a,b}=2; day2: {a,b}=2 (day0 still in
    # the 3-day window); day3: {b,c}=2 (day1's b + day3's c); anchors
    # past the last observed bucket are clipped
    assert got == {0: 2, 1: 2, 2: 2, 3: 2}
    with pytest.raises(ValueError):
        rolling_distinct(ev, "user", 0)


def test_pmi_pairs_hand_fixture(spark):
    from go_muse_spark.operators.terms import pmi_pairs
    import math
    import pytest

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b c"), (4, "c d")],
        "doc_id long, text string",
    )
    out = pmi_pairs(docs, 4, top_vocab=10, min_pair=1).collect()
    got = {(r["tok_a"], r["tok_b"]): r for r in out}
    # presence counts: a=3, b=3, c=2, d=1; pair (a,b)=3, (b,c)=1, (a,c)=1,
    # (c,d)=1
    r = got[("a", "b")]
    assert (r["c_ab"], r["c_a"], r["c_b"]) == (3, 3, 3)
    assert abs(r["pmi"] - math.log(3 * 4 / 9)) < 1e-12
    # duplicated tokens inside one doc count once (presence, not freq)
    out2 = pmi_pairs(
        spark.createDataFrame([(1, "x x y")], "doc_id long, text string"),
        1, top_vocab=10, min_pair=1,
    ).collect()
    assert out2[0]["c_ab"] == 1 and out2[0]["c_a"] == 1
    # vocab bound: with top_vocab=2 only the 2 most frequent tokens
    # (a, b — ties broken by token) can pair
    out3 = pmi_pairs(docs, 4, top_vocab=2, min_pair=1).collect()
    assert {(r["tok_a"], r["tok_b"]) for r in out3} == {("a", "b")}
    # min_pair drops singletons
    out4 = pmi_pairs(docs, 4, top_vocab=10, min_pair=2).collect()
    assert {(r["tok_a"], r["tok_b"]) for r in out4} == {("a", "b")}
    with pytest.raises(ValueError):
        pmi_pairs(docs, 4, top_vocab=1)


def test_histogram_ladder_merge_is_lossless(spark):
    """Summing fine-bucket histogram bins to a coarse bucket equals
    building the coarse histogram from raw rows (histogram linearity —
    the invariant behind the stored-histogram quantile ladder)."""
    import datetime as dt
    from pyspark.sql import functions as F
    from go_muse_spark.operators.olap import value_histogram

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (t0 + dt.timedelta(minutes=7 * i), float((i * 37) % 500))
        for i in range(300)
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, value double")
    evh = ev.select(
        (F.unix_timestamp("ts") - F.unix_timestamp("ts") % 3600).alias("h"),
        "value",
    )
    fine = value_histogram(evh, "value", 0.0, 32.0, 16, dims=("h",))
    laddered = (
        fine.groupBy(
            (F.col("h") - F.col("h") % 86400).alias("d"), "bin_idx"
        ).agg(F.sum("n").alias("n"))
    )
    evd = ev.select(
        (F.unix_timestamp("ts") - F.unix_timestamp("ts") % 86400).alias("d"),
        "value",
    )
    direct = value_histogram(evd, "value", 0.0, 32.0, 16, dims=("d",))
    a = {(r["d"], r["bin_idx"]): r["n"] for r in laddered.collect()}
    b = {(r["d"], r["bin_idx"]): r["n"] for r in direct.collect()}
    assert a == b
