"""stratified_sample: determinism, rates, dedup-consistency, plan."""

import random
import string

import pandas as pd
import pytest
from pyspark.sql import functions as F

from go_muse_spark.operators.sampling import stratified_sample


def _docs(spark, n=800, seed=5):
    rng = random.Random(seed)
    langs = ["en", "es", "zh"]
    rows = [
        (
            i,
            " ".join(
                "".join(rng.choices(string.ascii_lowercase, k=5))
                for _ in range(8)
            ),
            langs[rng.randrange(3)],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    )


def test_partitioning_independent(spark):
    df = _docs(spark)
    rates = {"en": 0.5, "es": 0.2}
    a = sorted(
        r["doc_id"] for r in stratified_sample(df, rates).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(df.repartition(7), rates).collect()
    )
    c = sorted(
        r["doc_id"]
        for r in stratified_sample(df.coalesce(1), rates).collect()
    )
    assert a == b == c and len(a) > 0


def test_rates_and_missing_strata(spark):
    df = _docs(spark)
    totals = {r["lang"]: r["n"] for r in df.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    got = stratified_sample(df, {"en": 0.5, "es": 1.0}).collect()
    by_lang = {}
    for r in got:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + 1
    assert "zh" not in by_lang  # absent stratum -> dropped
    assert by_lang["es"] == totals["es"]  # rate 1.0 keeps all
    frac = by_lang["en"] / totals["en"]
    assert 0.35 < frac < 0.65  # hash-uniformity, loose bound


def test_duplicates_sample_together(spark):
    df = _docs(spark, n=100)
    dup = df.withColumn("doc_id", F.col("doc_id") + 100000)
    both = df.unionByName(dup)
    kept = stratified_sample(both, {"en": 0.4, "es": 0.4, "zh": 0.4})
    # every kept text appears an even number of times (both copies)
    counts = [
        r["n"]
        for r in kept.groupBy("text").agg(
            F.count(F.lit(1)).alias("n")).collect()
    ]
    assert counts and all(n % 2 == 0 for n in counts)


def test_map_only_plan(spark):
    df = _docs(spark, n=10)
    plan = (
        stratified_sample(df, {"en": 0.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_bad_rate_raises(spark):
    with pytest.raises(ValueError, match="rate"):
        stratified_sample(_docs(spark, n=5), {"en": 1.5}).collect()


# ------------------------------------------------------------ split_assign


def test_split_fractions_partition_and_determinism(spark):
    from go_muse_spark.operators.sampling import split_assign

    df = _docs(spark, n=2000)
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = split_assign(df, fr)
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert None not in counts  # fractions sum to 1 -> nothing held out
    assert sum(counts.values()) == 2000
    # roughly proportional (hash-uniform over random text)
    assert counts["train"] > counts["val"]
    assert abs(counts["train"] / 2000 - 0.8) < 0.06
    # partitioning-independent
    a = sorted((r["doc_id"], r["split"]) for r in out.collect())
    b = sorted(
        (r["doc_id"], r["split"])
        for r in split_assign(df.repartition(13), fr).collect()
    )
    assert a == b


def test_split_duplicates_land_together_and_holdout(spark):
    from go_muse_spark.operators.sampling import split_assign

    df = _docs(spark, n=300)
    dup = df.union(df)  # byte-identical duplicates
    out = split_assign(dup, {"train": 0.5, "val": 0.2})
    per_text = (
        out.groupBy("text")
        .agg(F.count_distinct("split").alias("k"), F.count("*").alias("n"))
        .collect()
    )
    assert all(r["k"] <= 1 for r in per_text)  # never straddles splits
    # 30% of the hash space is deliberately held out as NULL
    n_null = out.filter(F.col("split").isNull()).count()
    assert 0 < n_null < 600


def test_split_fraction_validation(spark):
    from go_muse_spark.operators.sampling import split_assign

    df = _docs(spark, n=10)
    with pytest.raises(ValueError):
        split_assign(df, {"a": 0.7, "b": 0.4})
    with pytest.raises(ValueError):
        split_assign(df, {"a": -0.1})


def test_pack_sequences_chunk_assignment(spark):
    import pandas as pd

    from go_muse_spark.operators.sampling import pack_sequences

    # one shard, budget 10: weights 4,4,4,9,1 -> cum_before 0,4,8,12,21
    # -> batches 0,0,0,1,2
    rows = [(0, i, w) for i, w in enumerate([4, 4, 4, 9, 1])]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["shard", "doc_id", "tok"])
    )
    out = {
        r["doc_id"]: r["batch_id"]
        for r in pack_sequences(
            df, "tok", 10, "doc_id", by=("shard",)
        ).collect()
    }
    assert out == {0: 0, 1: 0, 2: 0, 3: 1, 4: 2}


def test_pack_sequences_shard_isolation_and_validation(spark):
    import pandas as pd
    import pytest

    from go_muse_spark.operators.sampling import pack_sequences

    rows = [(0, 0, 7), (0, 1, 7), (1, 0, 7), (1, 1, 7)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["shard", "doc_id", "tok"])
    )
    out = pack_sequences(df, "tok", 10, "doc_id", by=("shard",)).collect()
    # each shard restarts its prefix sum: second doc of each shard
    # starts at token 7 -> still batch 0
    assert all(r["batch_id"] == 0 for r in out)
    with pytest.raises(ValueError):
        pack_sequences(df, "tok", 0, "doc_id")


def test_pack_sequences_random_parity(spark):
    import random

    import pandas as pd

    from go_muse_spark.operators.sampling import pack_sequences

    rng = random.Random(17)
    rows = [
        (i % 4, i, rng.randrange(0, 300))
        for i in range(400)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["shard", "doc_id", "tok"])
    )
    got = {
        (r["shard"], r["doc_id"]): r["batch_id"]
        for r in pack_sequences(df, "tok", 512, "doc_id", by=("shard",)).collect()
    }
    pdf = pd.DataFrame(rows, columns=["shard", "doc_id", "tok"])
    for shard, g in pdf.groupby("shard"):
        g = g.sort_values("doc_id")
        cum = 0
        for _, r in g.iterrows():
            assert got[(shard, r["doc_id"])] == cum // 512
            cum += r["tok"]


def test_mixture_sample_balances_to_smallest(spark):
    from go_muse_spark.operators.sampling import mixture_sample

    # source A: 30 docs x 10 tokens = 300; source B: 5 docs x 10 = 50
    # -> rate_A = 50/300, rate_B = 1.0 (kept whole)
    rows = [(i, "w" + " w" * 9, "A") for i in range(30)]
    rows += [(100 + i, "x" + " x" * 9, "B") for i in range(5)]
    # vary A's texts so the hash spreads (identical text = same bucket)
    rows = [
        (i, t if s == "B" else f"tok{i} " + t, s) for (i, t, s) in rows
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = mixture_sample(docs, denom=10000).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert len(by_src["B"]) == 5  # smallest stratum kept whole
    assert by_src["B"][0]["keep_thr"] == 10000
    # A has 30 docs x 11 tokens = 330 -> thr = round(50/330*10000) = 1515
    if "A" in by_src:
        assert by_src["A"][0]["keep_thr"] == 1515
        assert 0 < len(by_src["A"]) < 30
    # determinism: same input -> identical kept set
    again = {r["doc_id"] for r in mixture_sample(docs, denom=10000).collect()}
    assert again == {r["doc_id"] for r in out}


def test_mixture_sample_null_strata_never_set_the_floor(spark):
    from go_muse_spark.operators.sampling import mixture_sample

    rows = [(i, f"tok{i} " + "w " * 9, "A") for i in range(20)]
    rows += [(100 + i, "x " * 10, "B") for i in range(10)]
    rows += [(200, "stray", None), (201, "lost doc", None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = mixture_sample(docs, denom=10000).collect()
    # NULL-source docs are dropped AND do not drag keep_thr toward ~0:
    # B (the smallest REAL stratum) keeps threshold 10000
    assert all(r["source"] is not None for r in out)
    thr = {r["source"]: r["keep_thr"] for r in out}
    assert thr.get("B") == 10000
