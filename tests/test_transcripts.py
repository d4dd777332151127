"""F1 corpus generator invariants (FIXTURES.md §F1)."""

import numpy as np

from go_muse_spark.sources.transcripts import (
    deterministic_text,
    generate_transcripts,
)


def test_deterministic():
    a = generate_transcripts(n_convs=50, seed=42)
    b = generate_transcripts(n_convs=50, seed=42)
    assert a.equals(b)  # byte-identical corpus
    c = generate_transcripts(n_convs=50, seed=43)
    assert not a.equals(c)


def test_schema_and_invariants():
    t = generate_transcripts(n_convs=60, seed=42, hot_turns=2000).to_pandas()
    assert list(t.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    # (conv_id, turn_idx) unique & dense per conv
    assert not t.duplicated(["conv_id", "turn_idx"]).any()
    g = t.groupby("conv_id")
    assert (g["turn_idx"].max() + 1 == g.size()).all()
    # ts monotone non-decreasing within conv (input is conv-then-idx sorted)
    assert (
        t.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")["ts"]
        .apply(lambda s: s.is_monotonic_increasing)
        .all()
    )
    # tool set only on tool rows
    assert (t.loc[t["role"] == "tool", "tool"] != "").all()
    assert (t.loc[t["role"] != "tool", "tool"] == "").all()
    # heavy tail: hot conv >= 1000 turns while median conv is small
    sizes = g.size()
    assert sizes.max() >= 1000 and sizes.median() <= 100


def test_text_pure_function_of_identity():
    # per-turn text equality invariant: text depends only on (conv, idx)
    t1 = generate_transcripts(n_convs=30, seed=42).to_pandas()
    conv = np.array([3, 7]); idx = np.array([0, 5])
    expect = deterministic_text(conv, idx)
    got = [
        t1[(t1.conv_id == f"c{c:08d}") & (t1.turn_idx == i)]["text"].iloc[0]
        for c, i in zip(conv, idx)
    ]
    assert list(expect) == got


def test_counter_rate_reset_correction(spark):
    """PromQL increase() rule: a counter restart (value drops) counts the
    post-reset value as the increase; gauge mode keeps the raw delta."""
    import datetime as dt

    from go_muse_spark.operators.rollup import counter_rate

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("c", t0 + dt.timedelta(hours=h), v)
        for h, v in [(0, 10.0), (1, 25.0), (2, 5.0), (3, 11.0)]
    ]  # 25 -> 5 is a reset
    df = spark.createDataFrame(
        rows, "conv_id string, bucket_ts timestamp, cnt double"
    )
    got = {
        r["bucket_ts"].hour: (r["delta"], r["rate_per_s"])
        for r in counter_rate(df, "cnt").collect()
    }
    assert got[1] == (15.0, 15.0 / 3600)
    assert got[2] == (5.0, 5.0 / 3600)  # reset: increase = post-reset value
    assert got[3] == (6.0, 6.0 / 3600)
    assert 0 not in got  # first bucket has no predecessor
    gauge = {
        r["bucket_ts"].hour: r["delta"]
        for r in counter_rate(df, "cnt", counter=False).collect()
    }
    assert gauge[2] == -20.0
