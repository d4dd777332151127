"""Continuous-aggregate pipeline: incremental MERGE of transcript deltas
into the 1m/1h/1d tier tables + chunk tables, checkpointed and resumable.

Semantics (SURVEY.md §7 L1/Ops; "late data" per §2b streaming row):
a delta batch may contain turns landing in buckets that were already
closed. Rather than trusting additive updates (which double-count on
re-delivery), every affected (conv_id, bucket) aggregate is RECOMPUTED
from the raw turn store and merged with replace-by-key semantics. Because
the raw store itself is idempotent on (conv_id, turn_idx), re-running any
delta — including a crashed, half-finished one — converges to the same
tables: ingest is exactly-once at the batch level (run_id committed in
the checkpoint log only after all tables land) and idempotent at the row
level.

Scale shape: the recompute is pruned two ways — partition pruning on the
raw store's date partitions (affected dates only) and a broadcast
semi-join on affected conv_ids. Cost per batch is O(delta + touched
buckets), never O(history). Skewed hot conversations are bounded by the
bucket grain: one conv contributes at most one row per bucket per tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_muse_spark.operators.compress import encode_chunks
from go_muse_spark.operators.rollup import TIERS, rollup_transcripts
from go_muse_spark.sources.store import ParquetTableStore

__all__ = ["ContinuousAggregates"]

RAW = "transcripts_raw"


def tier_table(tier: str) -> str:
    return f"rollup_{tier}"


class ContinuousAggregates:
    def __init__(
        self,
        store: ParquetTableStore,
        tiers: tuple[str, ...] = ("1m", "1h", "1d"),
        chunk_tiers: tuple[str, ...] = ("1h",),
        chunk_size: int = 1024,
        strict_dups: bool = False,
    ) -> None:
        self.store = store
        self.tiers = tiers
        self.chunk_tiers = chunk_tiers
        self.chunk_size = chunk_size
        # strict_dups=True surfaces the reference's duplicate-UID
        # rejection (group.go:39-41): a delta with colliding
        # (conv_id, turn_idx) keys raises instead of keeping a single
        # arbitrary winner (exact in the re-delivery case, where the
        # colliding rows are identical)
        self.strict_dups = strict_dups

    # ------------------------------------------------------------- ingest

    def ingest(self, delta: DataFrame, run_id: str) -> dict[str, int]:
        """Merge one transcript delta batch. Returns rows-out per table.

        Re-invoking with an already-committed run_id is a no-op; a crashed
        run re-invoked with the same run_id redoes its writes and
        converges byte-identically (replace-by-key + raw idempotence).
        """
        store = self.store
        if store.is_committed(run_id, "_batch"):
            return {}
        metrics: dict[str, int] = {}
        rows_in = delta.count()

        # 0. in-delta key collisions: always counted into the checkpoint
        #    metrics; strict mode refuses the batch (group.go:39-41)
        dup_rows = store.dup_key_count(delta, ["conv_id", "turn_idx"])
        if self.strict_dups and dup_rows:
            raise ValueError(
                f"delta {run_id!r} carries {dup_rows} duplicate "
                "(conv_id, turn_idx) row(s) (strict_dups)"
            )
        metrics["_dup_keys"] = dup_rows

        # 1. raw store: idempotent on the (conv_id, turn_idx) natural key
        metrics[RAW] = store.upsert(
            delta, RAW, ["conv_id", "turn_idx"], F.to_date("ts")
        )

        # 2. affected minute buckets (the finest grain); coarser tiers are
        #    supersets by truncation
        affected = (
            delta.select(
                "conv_id", F.date_trunc("minute", "ts").alias("bucket_1m")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        affected_dates = [
            r[0]
            for r in affected.select(F.to_date("bucket_1m")).distinct().collect()
        ]

        # 3. recompute each tier for affected buckets from the raw store,
        #    pruned by date partition + semi-join on affected keys
        raw = store.read(RAW).filter(F.col("part").isin(affected_dates))
        for tier in self.tiers:
            unit, _, _ = TIERS[tier]
            keys = (
                affected.select(
                    F.col("conv_id").alias("__c"),
                    F.date_trunc(unit, "bucket_1m").alias("__b"),
                )
                .distinct()
            )
            scoped = raw.join(
                F.broadcast(keys),
                (raw["conv_id"] == keys["__c"])
                & (F.date_trunc(unit, raw["ts"]) == keys["__b"]),
                "left_semi",
            )
            rolled = rollup_transcripts(scoped, tier)
            metrics[tier_table(tier)] = store.upsert(
                rolled,
                tier_table(tier),
                ["conv_id", "bucket_ts"],
                F.to_date("bucket_ts"),
            )

        # 4. chunk tables: re-encode affected conversations per chunk tier
        convs = affected.select("conv_id").distinct()
        for tier in self.chunk_tiers:
            tier_rows = store.read(tier_table(tier)).join(
                F.broadcast(convs), "conv_id", "left_semi"
            )
            # fused gapfill+encode: one shuffle + one Python stage
            chunks = encode_chunks(
                tier_rows, tier, "turn_cnt", self.chunk_size, fill="zero"
            )
            metrics[f"chunks_{tier}"] = store.upsert(
                chunks,
                f"chunks_{tier}",
                ["conv_id", "tier", "chunk_start"],
                F.to_date("chunk_start"),
            )

        # 5. commit: per-table checkpoint rows with watermark + row counts
        wm = delta.agg(F.max("ts")).collect()[0][0]
        seq = store.next_seq()
        rows = [
            (run_id, t, ",".join(str(d) for d in sorted(affected_dates)), wm,
             rows_in, n, seq)
            for t, n in metrics.items()
        ]
        rows.append((run_id, "_batch", "", wm, rows_in, rows_in, seq))
        store.log_checkpoint(rows)
        return metrics

    # ---------------------------------------------------------- retention

    def apply_retention(
        self,
        run_id: str,
        now,
        ttl_days: dict[str, int | None] | None = None,
    ) -> dict[str, int]:
        """Enforce per-tier retention: drop tier (and chunk) partitions
        older than each tier's TTL — the downsample-then-expire policy a
        retention engine exists for (fine tiers age out first, the 1d
        tier is kept indefinitely by default). Partition-granular
        deletes, logged to the checkpoint log like any other mutation so
        lineage shows WHEN data was expired and by which run.

        ttl_days: tier -> days to keep (None = keep forever). Defaults:
        1m for 7 days, 1h for 90, 1d forever.
        """
        import datetime as dt

        from go_muse_spark.operators.rollup import TIERS

        ttl = {"1m": 7, "1h": 90, "1d": None}
        ttl.update(ttl_days or {})
        today = now.date() if isinstance(now, dt.datetime) else now
        metrics: dict[str, int] = {}
        rows = []
        seq = self.store.next_seq()
        for tier, days in ttl.items():
            if days is None or tier not in self.tiers:
                continue
            cutoff = today - dt.timedelta(days=days)
            dropped = self.store.drop_partitions_before(
                tier_table(tier), cutoff
            )
            metrics[tier_table(tier)] = len(dropped)
            # one checkpoint row per (run_id, table, partition) dropped —
            # the same shape every other log row uses; a run that drops
            # nothing logs nothing (so is_committed stays false for it)
            rows.extend(
                (run_id, tier_table(tier), p, None, 0, 1, seq)
                for p in dropped
            )
            if tier in self.chunk_tiers:
                # chunk partitions are keyed by chunk START date, but a
                # chunk extends up to chunk_size buckets past its start —
                # shift the cutoff back by that span so no chunk holding
                # in-retention buckets is deleted (the tail of expired
                # chunks lingers until its whole span ages out; a
                # compaction pass can trim it eagerly)
                span_days = -(-self.chunk_size * TIERS[tier][1] // 86_400)
                c_cutoff = cutoff - dt.timedelta(days=span_days)
                dropped = self.store.drop_partitions_before(
                    f"chunks_{tier}", c_cutoff
                )
                metrics[f"chunks_{tier}"] = len(dropped)
                rows.extend(
                    (run_id, f"chunks_{tier}", p, None, 0, 1, seq)
                    for p in dropped
                )
        if rows:
            self.store.log_checkpoint(rows)
        return metrics

    # ------------------------------------------------------------- resume

    def unprocessed(self, source: DataFrame) -> DataFrame:
        """Rows of `source` newer than the committed watermark — the
        resume path after a stop: ingest(unprocessed(src), new_run_id)."""
        wm = self.store.watermark("_batch")
        return source if wm is None else source.filter(F.col("ts") > F.lit(wm))
