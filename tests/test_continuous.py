"""M5 — incremental MERGE, checkpoints, late data, crash-resume idempotence."""

import pyspark.sql.functions as F
import pytest

from go_muse_spark.operators.rollup import rollup_all_tiers
from go_muse_spark.plans.continuous import RAW, ContinuousAggregates, tier_table
from go_muse_spark.sources.store import ParquetTableStore
from go_muse_spark.sources.transcripts import generate_transcripts


@pytest.fixture()
def corpus(spark):
    import pandas as pd

    pdf = generate_transcripts(n_convs=40, seed=42, hot_turns=800).to_pandas()
    return spark.createDataFrame(pdf)


def snapshot(store, tiers=("1m", "1h", "1d")):
    out = {}
    for t in tiers:
        rows = store.read(tier_table(t)).select(
            "conv_id", "bucket_ts", "turn_cnt", "tool_cnt", "first_ts", "last_ts"
        ).collect()
        out[t] = sorted(map(tuple, rows))
    return out


def batch_rollup_snapshot(df):
    tiers = rollup_all_tiers(df)
    return {
        t: sorted(
            map(
                tuple,
                tiers[t]
                .select("conv_id", "bucket_ts", "turn_cnt", "tool_cnt",
                        "first_ts", "last_ts")
                .collect(),
            )
        )
        for t in ("1m", "1h", "1d")
    }


def test_incremental_equals_batch(spark, corpus, tmp_path):
    """Three ts-ordered deltas merged sequentially == one-shot rollup."""
    store = ParquetTableStore(spark, str(tmp_path / "store"))
    ca = ContinuousAggregates(store, chunk_tiers=("1h",))
    qs = corpus.approxQuantile("turn_idx", [0.33, 0.66], 0.01)
    d1 = corpus.filter(F.col("turn_idx") <= qs[0])
    d2 = corpus.filter((F.col("turn_idx") > qs[0]) & (F.col("turn_idx") <= qs[1]))
    d3 = corpus.filter(F.col("turn_idx") > qs[1])
    ca.ingest(d1, "run-1")
    ca.ingest(d2, "run-2")
    ca.ingest(d3, "run-3")
    assert snapshot(store) == batch_rollup_snapshot(corpus)
    # raw store holds each turn exactly once
    assert store.read(RAW).count() == corpus.count()


def test_reingest_is_idempotent(spark, corpus, tmp_path):
    """Replaying a delta (crash-resume) leaves every table unchanged."""
    store = ParquetTableStore(spark, str(tmp_path / "store"))
    ca = ContinuousAggregates(store, chunk_tiers=("1h",))
    half = corpus.filter(F.col("turn_idx") % 2 == 0)
    rest = corpus.filter(F.col("turn_idx") % 2 == 1)
    ca.ingest(half, "run-1")
    ca.ingest(rest, "run-2")
    before = snapshot(store)
    chunks_before = sorted(
        (r["conv_id"], r["chunk_start"], bytes(r["val_bytes"]))
        for r in store.read("chunks_1h").collect()
    )
    # same data, NEW run id (simulates redelivery after checkpoint loss)
    ca.ingest(rest, "run-3")
    assert snapshot(store) == before
    chunks_after = sorted(
        (r["conv_id"], r["chunk_start"], bytes(r["val_bytes"]))
        for r in store.read("chunks_1h").collect()
    )
    assert chunks_after == chunks_before
    # committed run id short-circuits entirely
    assert ca.ingest(rest, "run-2") == {}


def test_late_data_reopens_buckets(spark, corpus, tmp_path):
    """Turns arriving for an already-closed bucket update that bucket."""
    store = ParquetTableStore(spark, str(tmp_path / "store"))
    ca = ContinuousAggregates(store, chunk_tiers=())
    late = corpus.orderBy("ts").limit(200)  # earliest turns arrive LAST
    first = corpus.join(late, ["conv_id", "turn_idx"], "left_anti")
    ca.ingest(first, "run-1")
    ca.ingest(late, "run-2")
    assert snapshot(store) == batch_rollup_snapshot(corpus)


def test_watermark_resume(spark, corpus, tmp_path):
    store = ParquetTableStore(spark, str(tmp_path / "store"))
    ca = ContinuousAggregates(store, chunk_tiers=())
    cut_s = corpus.select(
        F.percentile_approx(F.col("ts").cast("double"), 0.5).alias("m")
    ).collect()[0]["m"]
    cut = corpus.filter(F.col("ts").cast("double") <= cut_s).agg(
        F.max("ts")
    ).collect()[0][0]
    ca.ingest(corpus.filter(F.col("ts") <= cut), "run-1")
    remaining = ca.unprocessed(corpus)
    assert remaining.count() == corpus.filter(F.col("ts") > cut).count()
    ca.ingest(remaining, "run-2")
    assert ca.unprocessed(corpus).count() == 0
    assert snapshot(store) == batch_rollup_snapshot(corpus)
    # checkpoint log carries lineage: run ids, watermarks, row counts
    ck = store.checkpoints().toPandas()
    assert set(ck["run_id"]) == {"run-1", "run-2"}
    assert (ck[ck["table"] != "_dup_keys"]["rows_out"] > 0).all()
    # key-collision metric is logged per batch (0 for a clean corpus)
    dk = ck[ck["table"] == "_dup_keys"]
    assert len(dk) == 2 and (dk["rows_out"] == 0).all()


def test_strict_dups_rejects_colliding_delta(spark, corpus, tmp_path):
    """group.go:39-41 semantics surfaced: a delta carrying the same
    (conv_id, turn_idx) twice raises in strict mode; the default mode
    logs the collision count and keeps one row per key (arbitrary
    winner — exact when collisions are identical re-deliveries)."""
    store = ParquetTableStore(spark, str(tmp_path / "store"))
    # ordered limits: a total order over the unique key makes the
    # 40-row slice a deterministic subset of the 100-row slice
    ordered = corpus.orderBy("conv_id", "turn_idx")
    dup_delta = ordered.limit(100).unionByName(ordered.limit(40))

    strict = ContinuousAggregates(store, chunk_tiers=(), strict_dups=True)
    with pytest.raises(ValueError, match="duplicate"):
        strict.ingest(dup_delta, "run-bad")

    lax = ContinuousAggregates(store, chunk_tiers=())
    lax.ingest(dup_delta, "run-lax")
    ck = store.checkpoints().toPandas()
    dk = ck[(ck["table"] == "_dup_keys") & (ck["run_id"] == "run-lax")]
    assert dk["rows_out"].iloc[0] == 40
    # single winner per key: each key lands exactly once in the raw store
    assert store.read(RAW).count() == 100


def test_store_upsert_on_dup_error(spark, corpus, tmp_path):
    store = ParquetTableStore(spark, str(tmp_path / "s2"))
    clean = corpus.orderBy("conv_id", "turn_idx").limit(50)
    assert store.dup_key_count(clean, ["conv_id", "turn_idx"]) == 0
    n = store.upsert(
        clean, "t", ["conv_id", "turn_idx"], F.to_date("ts"), on_dup="error"
    )
    assert n == 50
    dup = clean.unionByName(clean.orderBy("conv_id", "turn_idx").limit(10))
    assert store.dup_key_count(dup, ["conv_id", "turn_idx"]) == 10
    with pytest.raises(ValueError, match="duplicate-key"):
        store.upsert(
            dup, "t", ["conv_id", "turn_idx"], F.to_date("ts"), on_dup="error"
        )


def test_upsert_empty_delta_is_noop(spark, corpus, tmp_path):
    """0-row delta (the resume path with no new rows) must merge as a
    no-op, not crash on an empty staging dir."""
    store = ParquetTableStore(spark, str(tmp_path / "s3"))
    first = corpus.orderBy("conv_id", "turn_idx").limit(30)
    assert store.upsert(first, "t", ["conv_id", "turn_idx"], F.to_date("ts")) == 30
    empty = corpus.filter(F.lit(False))
    assert store.upsert(empty, "t", ["conv_id", "turn_idx"], F.to_date("ts")) == 0
    assert store.read("t").count() == 30


def test_apply_retention_expires_fine_tiers(spark, corpus, tmp_path):
    """Downsample-then-expire: the 1m tier ages out first, 1h keeps a
    longer window, 1d survives; drops are partition-granular and logged
    to the checkpoint lineage."""
    import datetime as dt

    store = ParquetTableStore(spark, str(tmp_path / "store"))
    ca = ContinuousAggregates(store, chunk_tiers=())
    ca.ingest(corpus, "run-1")
    hi = corpus.agg(F.max("ts")).collect()[0][0]

    def parts(table):
        return set(
            r[0] for r in store.read(table).select("part").distinct().collect()
        )

    before_1m, before_1h, before_1d = (
        parts(tier_table(t)) for t in ("1m", "1h", "1d")
    )
    # cutoff chosen so ~the older half of the corpus's days expire at 1m
    span = (hi.date() - min(before_1m)).days
    keep_1m = max(span // 2, 1)
    metrics = ca.apply_retention(
        "ret-1", hi, ttl_days={"1m": keep_1m, "1h": span + 2, "1d": None}
    )
    cutoff = hi.date() - dt.timedelta(days=keep_1m)
    assert metrics[tier_table("1m")] == len(
        [p for p in before_1m if p < cutoff]
    ) > 0
    assert parts(tier_table("1m")) == {p for p in before_1m if p >= cutoff}
    assert parts(tier_table("1h")) == before_1h  # inside its window
    assert parts(tier_table("1d")) == before_1d  # kept forever
    ck = store.checkpoints().toPandas()
    ret = ck[ck["run_id"] == "ret-1"]
    # one checkpoint row per (table, dropped partition); tiers that
    # dropped nothing (1h here) log nothing
    assert set(ret["table"]) == {tier_table("1m")}
    assert sorted(ret["part"]) == sorted(
        f"part={p}" for p in before_1m if p < cutoff
    )


def test_retention_never_drops_in_window_chunk_buckets(spark, corpus, tmp_path):
    """Chunk partitions are keyed by chunk START date but span chunk_size
    buckets: retention must shift the chunk cutoff back by that span so
    in-retention buckets stay decodable."""
    import datetime as dt

    from go_muse_spark.operators.compress import decode_chunks

    store = ParquetTableStore(spark, str(tmp_path / "store"))
    ca = ContinuousAggregates(store, chunk_tiers=("1h",), chunk_size=24)
    ca.ingest(corpus, "run-1")
    hi = corpus.agg(F.max("ts")).collect()[0][0]
    keep_days = 2
    ca.apply_retention(
        "ret-1", hi, ttl_days={"1m": None, "1h": keep_days, "1d": None}
    )
    cutoff = hi.date() - dt.timedelta(days=keep_days)
    kept_rollup = {
        (r["conv_id"], r["bucket_ts"])
        for r in store.read(tier_table("1h"))
        .filter(F.to_date("bucket_ts") >= F.lit(cutoff))
        .select("conv_id", "bucket_ts")
        .collect()
    }
    kept_chunks = {
        (r["conv_id"], r["bucket_ts"])
        for r in decode_chunks(store.read("chunks_1h"), "turn_cnt")
        .filter(
            (F.to_date("bucket_ts") >= F.lit(cutoff)) & (F.col("turn_cnt") > 0)
        )
        .select("conv_id", "bucket_ts")
        .collect()
    }
    assert kept_rollup <= kept_chunks  # no in-window bucket lost


def test_upsert_recovers_interrupted_swap(spark, tmp_path):
    """Crash simulation: a partition renamed aside to _old_ but whose
    staged replacement never landed (the mid-swap crash window). The
    next upsert must first roll the _old_ copy back so the merge sees —
    and keeps — the pre-crash rows, instead of silently rebuilding the
    partition from the new delta alone and deleting the only copy."""
    import os
    import shutil

    import pandas as pd

    store = ParquetTableStore(spark, str(tmp_path / "store"))
    base = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c1", "c2"],
                "turn_idx": [0, 0],
                "ts": [pd.Timestamp("2024-01-01"), pd.Timestamp("2024-01-02")],
                "v": [1.0, 2.0],
            }
        )
    )
    keys = ["conv_id", "turn_idx"]
    part = F.to_date("ts")
    store.upsert(base, "t", keys, part)
    assert store.read("t").count() == 2

    # simulate the crash: one live partition renamed aside into the
    # sibling backup dir, staged copy lost (the mid-swap window)
    dest = store.path("t")
    backup = os.path.join(store.root, "_backup_t")
    os.makedirs(backup, exist_ok=True)
    pdir = "part=2024-01-01"
    os.rename(os.path.join(dest, pdir), os.path.join(backup, pdir))
    assert store.read("t").count() == 1  # backup is reader-invisible

    # delta targets the CRASHED partition's date — without recovery the
    # merge would rebuild part=2024-01-01 from this row alone
    delta = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c3"],
                "turn_idx": [0],
                "ts": [pd.Timestamp("2024-01-01")],
                "v": [3.0],
            }
        )
    )
    store.upsert(delta, "t", keys, part)
    got = sorted(r["conv_id"] for r in store.read("t").collect())
    assert got == ["c1", "c2", "c3"], (
        "pre-crash rows lost: recovery must roll backup partitions back "
        "before merging"
    )
    # recovery also cleaned the backup dir up
    assert not os.path.isdir(backup)
    # orphaned staging dirs from the crashed run are swept too
    stale = os.path.join(store.root, "_stage_t_deadbeef")
    os.makedirs(stale, exist_ok=True)
    store.upsert(delta, "t", keys, part)
    assert not os.path.isdir(stale)


def test_iceberg_sql_builders():
    """The Iceberg backend's SQL generation is pure and asserted here —
    execution needs the runtime jar (absent in-sandbox), but what ships
    to a cluster is exactly this text."""
    import datetime as dt

    from go_muse_spark.sources.store import IcebergTableStore as S

    m = S.merge_sql("cat.ns.agg_1m", ["conv_id", "bucket_ts"])
    assert m == (
        "MERGE INTO cat.ns.agg_1m t USING _delta_src s "
        "ON t.conv_id = s.conv_id AND t.bucket_ts = s.bucket_ts "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    r = S.retention_sql("cat.ns.agg_1m", dt.date(2024, 3, 1))
    assert r == "DELETE FROM cat.ns.agg_1m WHERE part < DATE '2024-03-01'"
    e = S.expire_snapshots_sql("cat", "ns.agg_1m", "2024-03-01 00:00:00")
    assert e == (
        "CALL cat.system.expire_snapshots(table => 'ns.agg_1m', "
        "older_than => TIMESTAMP '2024-03-01 00:00:00')"
    )


def test_iceberg_merge_live_smoke(spark, tmp_path):
    """Live create -> MERGE -> read roundtrip through IcebergTableStore.

    Runs for real the moment an iceberg-spark runtime jar lands on the
    classpath (Iceberg reads `spark.sql.catalog.*` lazily at first use,
    so a runtime `conf.set` on the shared session is enough — no session
    rebuild). In this sandbox it skips: vendoring was attempted and is
    impossible (2026-08-19 — no DNS to repo1.maven.org, no jar on the
    filesystem, pyspark 4.1.2 bundles no table-format runtimes, pip
    disallowed; full log in sources/store.py IcebergTableStore
    docstring). The skip reason below is the audit trail; the MERGE
    semantics themselves are live-tested via ParquetTableStore.
    """
    from go_muse_spark.sources.store import IcebergTableStore, iceberg_available

    if not iceberg_available(spark):
        pytest.skip(
            "iceberg-spark runtime jar absent (attempted 2026-08-19: no "
            "network to Maven Central, no jar on filesystem, pip install "
            "disallowed — see IcebergTableStore docstring); SQL builders "
            "remain shape-asserted above and MERGE semantics live-tested "
            "through ParquetTableStore"
        )
    spark.conf.set(
        "spark.sql.catalog.smoke", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.smoke.type", "hadoop")
    spark.conf.set(
        "spark.sql.catalog.smoke.warehouse", str(tmp_path / "wh")
    )
    spark.sql("CREATE NAMESPACE IF NOT EXISTS smoke.ns")
    spark.sql(
        "CREATE TABLE smoke.ns.agg (conv_id STRING, bucket_ts BIGINT, "
        "n BIGINT) USING iceberg"
    )
    base = spark.createDataFrame(
        [("c1", 0, 1), ("c2", 0, 1)], "conv_id string, bucket_ts long, n long"
    )
    base.writeTo("smoke.ns.agg").append()
    store = IcebergTableStore(spark, "smoke", "ns")
    delta = spark.createDataFrame(
        [("c2", 0, 9), ("c3", 0, 1)], "conv_id string, bucket_ts long, n long"
    )
    store.upsert(delta, "agg", ["conv_id", "bucket_ts"])
    got = {
        (r["conv_id"], r["n"]) for r in store.read("agg").collect()
    }
    assert got == {("c1", 1), ("c2", 9), ("c3", 1)}


def test_layout_sort_prunes_partitions_and_tightens_rowgroups(
    spark, tmp_path
):
    import glob
    import os

    import pyarrow.parquet as pq

    store = ParquetTableStore(spark, str(tmp_path / "store"))
    # 3 day-partitions x 400 series, several rows each
    rows = [
        (f"c{cid:04d}", f"1970-01-0{d} 00:{m:02d}:00", cid * d + m)
        for d in (1, 2, 3)
        for cid in range(400)
        for m in (0, 30)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, bucket_ts string, turn_cnt long"
    ).withColumn("bucket_ts", F.col("bucket_ts").cast("timestamp"))
    store.upsert(
        df.repartition(8),
        "tier_1h",
        ["conv_id", "bucket_ts"],
        F.date_format("bucket_ts", "yyyy-MM-dd"),
        layout_sort=("conv_id",),
        layout_partitions=6,
    )
    # 1) partition pruning: a part filter must touch ONE partition dir
    scan = store.read("tier_1h").filter(F.col("part") == "1970-01-02")
    files = [
        r[0]
        for r in scan.select(F.input_file_name()).distinct().collect()
    ]
    assert files and all("part=1970-01-02" in f for f in files)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "1970-01-02" in plan
    assert scan.count() == 800
    # 2) clustering: within a partition the files cover narrow,
    # non-overlapping conv_id ranges (range-partitioned + sorted), so
    # min/max footer stats are selective for key predicates
    part_files = sorted(
        glob.glob(
            os.path.join(store.path("tier_1h"), "part=1970-01-01", "*.parquet")
        )
    )
    spans = []
    for f in part_files:
        md = pq.ParquetFile(f).metadata
        idx = {
            md.schema.column(i).name: i for i in range(md.num_columns)
        }["conv_id"]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append((min(mins), max(maxs)))
    assert len(spans) > 1  # range partitioning split the hot day
    spans.sort()
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # disjoint key ranges across files
    # a single file's span is a small slice of the 400-key domain
    widths = [
        int(hi[1:]) - int(lo[1:]) + 1 for lo, hi in spans
    ]
    assert max(widths) < 400
