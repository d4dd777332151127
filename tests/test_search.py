"""M1/M2 — muse search engine parity on the reference's golden queries.

Reproduces, through the Spark operator (not the raw kernels):
  * TestBatchRunSimple (muse_batch_test.go:9-44): groupBy graph, abs mode;
  * TestBatchRunMultiDimensional (muse_batch_test.go:46-82): 2-dim labels,
    groupBy graph keeps the best host per graph;
  * TestRunSimple sign filters (muse_test.go:75-121): signed mode, POS/NEG;
  * no-groupBy => per-series groups (group.go:84-89);
  * maxLag post-filter semantics (results.go:46-52).
"""

import numpy as np
import pytest

from go_muse_spark.operators.search import (
    SearchParams,
    apply_result_filters,
    mean_abs_score,
    muse_search,
    score_series,
    top_k,
)

REF = [0.0, 0, 0, 0, 1, 2, 3, 3, 2, 1, 0, 0]

SIMPLE = {
    "perfectMatch": [0.0, 0, 0, 0, 2, 4, 6, 6, 4, 2, 0, 0],
    "slightlyLower": [0.0, 0, 0, 0, 2, 4, 6, 4, 2, 0, 0, 0],
    "evenLower": [0.0, 0, 0, 2, 4, 2, 0, 0, 0, 0, 0, 0],
    "evenLowerShiftedAhead": [0.0, 0, 0, 0, 0, 0, 0, 0, 2, 3, 2, 0],
    "zeros": [3.0, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3],
}
# muse_batch_test.go:24-30 (abs mode)
SIMPLE_EXPECT = {
    "graph:perfectMatch": (0, 1.000),
    "graph:slightlyLower": (0, 0.929),
    "graph:evenLowerShiftedAhead": (-3, 0.754),
    "graph:evenLower": (2, 0.733),
    "graph:zeros": (0, 0.000),
}


def simple_df(spark):
    rows = [
        (name, name, [float(v) for v in vals]) for name, vals in SIMPLE.items()
    ]
    return spark.createDataFrame(
        rows, "series_key string, graph string, values array<double>"
    )


def test_batch_run_simple(spark):
    df = simple_df(spark)
    res = muse_search(
        df,
        np.array(REF),
        group_by=["graph"],
        params=SearchParams(top_n=20, max_lag=10, threshold=0.0, mode="abs", n_salt=2),
        series_key="series_key",
    )
    got = {r["group_key"]: (r["lag"], r["score"]) for r in res.collect()}
    assert set(got) == set(SIMPLE_EXPECT)
    for key, (lag, score) in SIMPLE_EXPECT.items():
        assert got[key][0] == lag, key
        assert abs(got[key][1] - score) < 1e-3, key
    # descending |score| order out of top_k
    ordered = [r["group_key"] for r in res.collect()]
    assert ordered[0] == "graph:perfectMatch" and ordered[-1] == "graph:zeros"


def test_mean_abs_score(spark):
    # Results.Fetch mean of |score| over passed rows (results.go:83-86)
    df = simple_df(spark)
    scored = score_series(df, np.array(REF), ["graph"], "abs", "series_key")
    expect = np.mean([abs(s) for _, s in SIMPLE_EXPECT.values()])
    assert abs(mean_abs_score(scored) - expect) < 1e-3


def test_per_series_grouping_signed(spark):
    # group_by=None -> every series its own group; signed Muse.Run scores
    # (muse_test.go:55-61: evenLowerShiftedAhead is NEGATIVE -0.754 for the
    # sign-flipped variant)
    flipped = dict(SIMPLE)
    flipped["evenLowerShiftedAhead"] = [0.0, 0, 0, 0, 0, 0, 0, 0, -2, -3, -2, 0]
    rows = [(k, [float(x) for x in v]) for k, v in flipped.items()]
    df = spark.createDataFrame(rows, "series_key string, values array<double>")
    scored = score_series(df, np.array(REF), None, "signed", "series_key")
    got = {r["group_key"]: (r["lag"], r["score"]) for r in scored.collect()}
    assert got["evenLowerShiftedAhead"][0] == -3
    assert abs(got["evenLowerShiftedAhead"][1] - (-0.754)) < 1e-3
    assert abs(got["perfectMatch"][1] - 1.0) < 1e-3

    # sign filters (muse_test.go:89-108): POS keeps 3 nonzero + zeros row
    pos = apply_result_filters(scored, 10, 0.0, "pos")
    keys = {r["group_key"] for r in pos.collect()}
    assert "evenLowerShiftedAhead" not in keys
    assert {"perfectMatch", "slightlyLower", "evenLower", "zeros"} == keys
    neg = apply_result_filters(scored, 10, 0.0, "neg")
    assert {r["group_key"] for r in neg.collect()} == {"evenLowerShiftedAhead"}
    # threshold drops the sigma=0 zero-score row (muse_test.go thresholds)
    thr = apply_result_filters(scored, 10, 0.5, "any")
    assert "zeros" not in {r["group_key"] for r in thr.collect()}


def test_multi_dimensional_group_best(spark):
    # muse_batch_test.go:46-82: groupBy graph, best host wins per graph
    ref = [0.0, 0.0, 0.0, 0.0, 0.1, 0.2, 0.3, 0.4]
    comp = [
        ("graph1", "host1", [0.0, 0.0, 0.0, 0.0, 0.1, 0.2, 0.3, 0.4]),
        ("graph1", "host2", [0.2, 0.1, 0.2, 0.1, 0.2, 0.1, 0.2, 0.1]),
        ("graph2", "host1", [0.0, 0.0, 0.0, 0.0, 0.2, 0.4, 0.4, 0.8]),
        ("graph3", "host1", [0.2, 0.1, 0.2, 0.1, 0.2, 0.1, 0.22, 0.1]),
        ("graph4", "host1", [0.0, 0.0, 0.0, 0.0, -0.2, -0.4, 0.0, -0.8]),
        ("graph5", "host1", [0.0, 0.0, 0.0, -0.2, -0.4, -0.6, 1.0, 0.0]),
    ]
    rows = [(f"{g}|{h}", g, h, [float(x) for x in v]) for g, h, v in comp]
    df = spark.createDataFrame(
        rows, "series_key string, graph string, host string, values array<double>"
    )
    res = muse_search(
        df,
        np.array(ref),
        group_by=["graph"],
        params=SearchParams(top_n=20, max_lag=10, mode="abs", n_salt=3),
        series_key="series_key",
    )
    got = {r["group_key"]: r for r in res.collect()}
    expect = {
        "graph:graph1": ("host1", 0, 1.000),
        "graph:graph2": ("host1", 0, 0.976),
        "graph:graph4": ("host1", 0, 0.759),
        "graph:graph5": ("host1", 2, 0.719),
        "graph:graph3": ("host1", 1, 0.248),
    }
    assert set(got) == set(expect)
    for k, (host, lag, score) in expect.items():
        assert got[k]["series_key"].endswith(host), k
        assert got[k]["lag"] == lag, k
        assert abs(got[k]["score"] - score) < 1e-3, k
    # groupBy graph+host -> 6 distinct groups (group_test.go style)
    res2 = score_series(df, np.array(ref), ["graph", "host"], "abs", "series_key")
    assert res2.count() == 6


def test_max_lag_is_post_filter(spark):
    # SURVEY.md §2c gotcha 1: argmax runs over ALL lags; if the best lag
    # falls outside maxLag the row is dropped, not re-searched.
    df = simple_df(spark)
    scored = score_series(df, np.array(REF), ["graph"], "abs", "series_key")
    res = apply_result_filters(scored, max_lag=1, threshold=0.0)
    keys = {r["group_key"] for r in res.collect()}
    # evenLowerShiftedAhead (lag -3) and evenLower (lag 2) must vanish
    assert keys == {"graph:perfectMatch", "graph:slightlyLower", "graph:zeros"}


def test_top_k_limit(spark):
    df = simple_df(spark)
    scored = score_series(df, np.array(REF), ["graph"], "abs", "series_key")
    res = top_k(scored, 2).collect()
    assert [r["group_key"] for r in res] == [
        "graph:perfectMatch",
        "graph:slightlyLower",
    ]


def test_salt_invariance(spark):
    # the salted two-level reduce must give identical results at any salt
    df = simple_df(spark)
    a = muse_search(df, np.array(REF), ["graph"], SearchParams(n_salt=1), "series_key")
    b = muse_search(df, np.array(REF), ["graph"], SearchParams(n_salt=16), "series_key")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_length_mismatch_raises(spark):
    # group.go:45-51 / muse_batch.go:24-28 equal-length invariant
    rows = [
        ("a", "g", [0.0, 1.0, 2.0, 3.0, 3.0, 2.0, 1.0, 0.0]),
        ("b", "g", [float(x) for x in np.zeros(20)]),
    ]
    df = spark.createDataFrame(
        rows, "series_key string, graph string, values array<double>"
    )
    with pytest.raises(Exception, match="length|shape"):
        muse_search(df, np.array([0.0, 1, 2, 3, 3, 2, 1, 0]), ["graph"],
                    SearchParams(n_salt=1), "series_key").collect()


def test_incremental_results_accumulator(spark):
    """EP1: successive batches against one Results accumulator
    (muse_test.go:67-69); later better scores displace earlier ones."""
    import numpy as np
    from go_muse_spark.operators.search import (
        IncrementalResults,
        SearchParams,
        score_series,
    )

    ref = np.array([0, 0, 0, 0, 1, 2, 3, 3, 2, 1, 0, 0], dtype=float)
    batch1 = spark.createDataFrame(
        [("a", [float(v) for v in [0, 0, 0, 2, 4, 2, 0, 0, 0, 0, 0, 0]]),
         ("b", [3.0] * 12)],
        "series_key string, values array<double>",
    )
    batch2 = spark.createDataFrame(
        [("c", [float(v) for v in [0, 0, 0, 0, 2, 4, 6, 6, 4, 2, 0, 0]]),
         ("d", [float(v) for v in [0, 0, 0, 0, 2, 4, 6, 4, 2, 0, 0, 0]])],
        "series_key string, values array<double>",
    )
    acc = IncrementalResults(SearchParams(top_n=3, max_lag=None, mode="abs"))
    for b in (batch1, batch2):
        acc.update(score_series(b, ref, None, "abs", "series_key", "values"))
    rows, mean = acc.fetch()
    got = [(r["series_key"], round(r["score"], 3)) for r in rows]
    assert got == [("c", 1.0), ("d", 0.929), ("a", 0.733)]
    assert abs(mean - (1.0 + 0.929 + 0.733) / 3) < 1e-3


def test_empty_inputs_yield_empty_results(spark):
    """Reference empty-batch early-exit (muse.go:47-50): empty tables
    flow through both search paths as empty results, no errors."""
    import numpy as np
    from go_muse_spark.operators.search import (
        SearchParams,
        muse_search,
        muse_search_rollup,
        series_bounds,
    )

    ref = np.array([0, 0, 1, 2, 1, 0, 0, 0], dtype=float)
    empty_arrays = spark.createDataFrame(
        [], "series_key string, values array<double>"
    )
    assert (
        muse_search(empty_arrays, ref, None, SearchParams(top_n=5),
                    "series_key", "values").count() == 0
    )
    empty_rollup = spark.createDataFrame(
        [], "conv_id string, bucket_ts timestamp, turn_cnt long"
    )
    assert series_bounds(empty_rollup, 3600) == (None, None, 0)
    assert (
        muse_search_rollup(empty_rollup, ref, 3600,
                           params=SearchParams(top_n=5)).count() == 0
    )


def test_multi_ref_matches_single_ref_per_key(spark):
    """score_rollup_multi with k refs must reproduce k independent
    score_rollup runs bit-for-bit (same kernels, amortized rfft), and
    muse_search_multi must apply top-K per reference."""
    import numpy as np

    from go_muse_spark.operators.search import (
        SearchParams,
        muse_search_multi,
        muse_search_rollup,
        score_rollup,
        score_rollup_multi,
        series_bounds,
    )
    from go_muse_spark.operators.rollup import rollup_transcripts
    from go_muse_spark.sources.transcripts import generate_transcripts

    pdf = generate_transcripts(n_convs=25, seed=11, hot_turns=400).to_pandas()
    rolled = rollup_transcripts(spark.createDataFrame(pdf), "1h")
    lo, hi, n = series_bounds(rolled, 3600)
    refA = np.zeros(n); refA[n // 4 : n // 4 + 5] = [1, 3, 5, 3, 1]
    refB = np.zeros(n); refB[n // 2 : n // 2 + 4] = [2, -5, -5, 2]
    refs = {"A": refA, "B": refB}
    multi = score_rollup_multi(
        rolled, refs, 3600, bounds=(lo, hi, n)
    ).collect()
    by_ref = {}
    for r in multi:
        by_ref.setdefault(r["ref_key"], {})[r["group_key"]] = (
            r["series_key"], r["lag"], r["score"],
        )
    for name, ref in refs.items():
        single = {
            r["group_key"]: (r["series_key"], r["lag"], r["score"])
            for r in score_rollup(
                rolled, ref, 3600, bounds=(lo, hi, n)
            ).collect()
        }
        assert by_ref[name] == single, name
    # per-ref top-K: k rows per reference, same membership as the
    # single-ref pipeline's top-K
    p = SearchParams(top_n=5, max_lag=n, threshold=0.0, mode="abs")
    topm = muse_search_multi(
        rolled, refs, 3600, params=p, bounds=(lo, hi, n)
    ).collect()
    cnt = {}
    for r in topm:
        cnt[r["ref_key"]] = cnt.get(r["ref_key"], 0) + 1
    assert cnt == {"A": 5, "B": 5}
    for name, ref in refs.items():
        want = {
            (r["group_key"], r["series_key"], r["lag"], r["score"])
            for r in muse_search_rollup(
                rolled, ref, 3600, params=p, bounds=(lo, hi, n)
            ).collect()
        }
        got = {
            (r["group_key"], r["series_key"], r["lag"], r["score"])
            for r in topm if r["ref_key"] == name
        }
        assert got == want, name
    # validation: wrong-length and zero-variance refs raise
    import pytest as _pytest

    with _pytest.raises(ValueError):
        score_rollup_multi(rolled, {"bad": np.ones(3)}, 3600, bounds=(lo, hi, n))
    with _pytest.raises(ValueError):
        score_rollup_multi(rolled, {"flat": np.zeros(n)}, 3600, bounds=(lo, hi, n))
    with _pytest.raises(ValueError):
        score_rollup_multi(rolled, {}, 3600, bounds=(lo, hi, n))
