"""Deduplication operators over a documents table (doc_id, text, ...).

The large-scale training-data-pipeline suite: exact, MinHash+LSH, SimHash,
and n-gram Jaccard dedup. All hashing is the dual-dialect arithmetic from
functions/text.py, so every operator here has a value-exact DuckDB oracle.

Scale shapes (the part that matters at 10^12 docs):
  * exact: one hash-aggregate on the content key — partial agg kills the
    shuffle volume; for long texts group on sha2(text) instead.
  * MinHash LSH: signatures are a narrow projection (k longs/doc);
    candidate generation is groupBy(band_hash) — only docs sharing a band
    bucket ever meet, so the pair space is output-sensitive, never O(n^2).
    Verification joins signatures back (equi-join on doc_id).
  * SimHash: one 64/16-bit fingerprint per doc; near-dup candidates via
    band equality on fingerprint nibbles (hamming<=d within buckets).
  * n-gram Jaccard: exact pairwise, but scoped by a blocking column
    (e.g. source) — the honest brute-force baseline for the LSH paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_muse_spark.functions import text as X

__all__ = [
    "exact_dedup",
    "hashed_shingles",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "minhash_near_dups",
    "simhash_fingerprints",
    "simhash_near_dups",
    "source_overlap",
    "ngram_jaccard_pairs",
    "dedup_clusters",
    "contamination_check",
]


def _materialize(df: DataFrame) -> DataFrame:
    """Compute a small derived table once and reuse it across self-joins.

    The shingle/minhash/simhash expressions are expensive relative to the
    tiny tables they produce (k longs or one fingerprint per doc); a
    self-join on the lazy lineage would re-execute them up to 2 x bands
    times (measured 8x = 55s vs 5s at sf0.1). At production scale the
    same answer is a persisted signature table maintained next to the
    corpus (write once, join many); localCheckpoint is the in-session
    equivalent.
    """
    return df.localCheckpoint(eager=True)


def exact_dedup(
    docs: DataFrame, content_col: str = "text", by_hash: bool = False
) -> DataFrame:
    """One row per distinct content: keeper (min doc_id) + dup count.

    by_hash=True groups on sha2-256 of the content and returns
    (content_hash, n_dups, keeper_id) WITHOUT the content column — the
    shape that survives 100 TB: the exchange then moves a 64-char digest
    per row instead of the full document text (documents average KBs;
    mostly-unique corpora get no map-side combine, so the shuffle is
    ~input-sized either way — what matters is the row WIDTH). Collision
    risk at 2^-128 is below hardware error rates. The default keeps the
    content column for small-corpus ergonomics."""
    if by_hash:
        return docs.groupBy(
            F.sha2(F.col(content_col), 256).alias("content_hash")
        ).agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("doc_id").alias("keeper_id"),
        )
    return docs.groupBy(content_col).agg(
        F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("keeper_id")
    )


def _widen(df: DataFrame) -> DataFrame:
    """Raise tiny-input parallelism before a CPU-heavy derivation.

    A small parquet file arrives as ONE scan split, so the shingle-hash
    expressions would run on one core of the whole session (measured:
    the entire minhash pipeline serialized behind a 1-task stage at
    bench scale). Repartitioning 5k text rows costs ~nothing; at
    production scale the scan already yields >= defaultParallelism
    splits and this is a guarded no-op (no shuffle added).

    The guard is df.rdd.getNumPartitions(): the only probe that sees the
    scan's ACTUAL task count after file packing. A file-count heuristic
    is wrong in both directions — Spark packs many tiny files into few
    splits (64 x 1 KB files -> ~2 tasks, the serialization this guard
    exists to catch) and splits few huge files into many (4 x 1 GB ->
    ~32 tasks, where a forced repartition would add a useless shuffle).
    The .rdd plan translation costs a few ms of driver work per call —
    cheap next to the stage it protects; production tables with many
    ~128 MB-class files never trip the repartition."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    return df


def hashed_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, th: array<bigint>) — the shared heavy pass: distinct word
    n-gram shingles, polynomial-hashed. Signature computation, LSH
    banding, AND exact-Jaccard verification all derive from this one
    column (the expression builders repeat their source textually, which
    would otherwise recompute the hashing per consumer).

    The word split is staged into a real column first so shingling stays
    LINEAR in document length (see functions.text.shingles: the inlined
    split is re-evaluated per element access, O(words^2) per doc —
    measured 10x on a 150-word corpus). The multiply-referenced
    non-cheap alias also stops CollapseProject from re-inlining it."""
    staged = _widen(docs).select(
        "doc_id", F.expr(X.tokens("spark")).alias("__toks")
    )
    return staged.select(
        "doc_id",
        F.expr(X.shingle_hashes("spark", n, toks_src="__toks")).alias("th"),
    )


def minhash_signatures(
    docs: DataFrame, k: int = 16, hashed: DataFrame | None = None
) -> DataFrame:
    hashed = hashed if hashed is not None else hashed_shingles(docs)
    return hashed.select(
        "doc_id", F.expr(X.minhash_array("spark", k, src="th")).alias("sig")
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    k: int = 16,
    bands: int = 4,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing at least one LSH band."""
    rows = k // bands
    sigs = _materialize(
        sigs if sigs is not None else minhash_signatures(docs, k)
    )
    banded = None
    for b in range(bands):
        part = sigs.select(
            "doc_id",
            F.lit(b).alias("band"),
            F.expr(X.band_hash("spark", "sig", b, rows)).alias("bh"),
        )
        banded = part if banded is None else banded.unionByName(part)
    a = banded.alias("a")
    bb = banded.alias("b")
    return (
        a.join(
            bb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def minhash_near_dups(
    docs: DataFrame, threshold: float = 0.5, k: int = 16, bands: int = 4
) -> DataFrame:
    """LSH candidates verified with 3-gram-shingle-set Jaccard.

    The verification operates on HASHED shingles in a ~2^30 space (mod P
    polynomial hashes), so it is collision-approximate, not exact: a
    cross-doc collision inflates the intersection, an in-doc collision
    shrinks a set. At ~10^4 shingles/doc the per-pair error is O(10^-5);
    for huge documents or when exactness matters, verify on the string
    shingles instead (swap `th` for `shingles()` at ~5x intersect cost)
    or widen the hash space.
    """
    # verify on HASHED shingles (bigint arrays): same set semantics as the
    # string shingles modulo the collision caveat above, and the identical
    # LCG arithmetic runs in the DuckDB oracle, so values stay engine-
    # exact. The hashed-shingle table is computed ONCE and feeds both the
    # signatures and the verification join.
    hashed = _materialize(hashed_shingles(docs, 3))
    sigs = minhash_signatures(docs, k, hashed=hashed)
    cands = lsh_candidate_pairs(docs, k, bands, sigs=sigs)
    toks = hashed.select("doc_id", F.col("th").alias("toks"))
    j = X.jaccard("spark", "ta.toks", "tb.toks")
    return (
        cands.join(toks.alias("ta"), cands["doc_a"] == F.col("ta.doc_id"))
        .join(toks.alias("tb"), cands["doc_b"] == F.col("tb.doc_id"))
        .select(
            "doc_a", "doc_b", F.round(F.expr(j), 6).alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_fingerprints(
    docs: DataFrame, bits: int = 16, hashed: DataFrame | None = None
) -> DataFrame:
    hashed = hashed if hashed is not None else hashed_shingles(docs)
    return hashed.select(
        "doc_id", F.expr(X.simhash("spark", bits, src="th")).alias("simhash")
    )


def simhash_near_dups(
    docs: DataFrame, bits: int = 16, max_hamming: int = 2, bands: int = 4
) -> DataFrame:
    """Pairs with hamming(simhash) <= max_hamming, blocked on nibble bands
    (a pair within hamming d shares >= bands-d of the bands; with d <
    bands at least one band matches exactly — the pigeonhole trick)."""
    fp = _materialize(simhash_fingerprints(docs, bits))
    width = bits // bands
    banded = None
    for b in range(bands):
        part = fp.select(
            "doc_id",
            "simhash",
            F.lit(b).alias("band"),
            ((F.col("simhash").bitwiseAND(
                F.lit(((1 << width) - 1) << (b * width))
            ))).alias("bh"),
        )
        banded = part if banded is None else banded.unionByName(part)
    a, bb = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            bb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.3,
    block_col: str = "source",
) -> DataFrame:
    """Brute-force n-gram-shingle Jaccard pairs within a blocking column.

    Jaccard is computed over mod-P hashed shingles (~2^30 space), so it is
    collision-approximate for very large shingle sets — see
    minhash_near_dups. The O(block^2) pairing is the honest baseline for
    the LSH paths; it does not survive a hot block at 10^12-doc scale.
    """
    sh = _materialize(
        _widen(docs)
        .select(
            "doc_id",
            F.col(block_col).alias("blk"),
            F.expr(X.tokens("spark")).alias("__toks"),
        )
        .select(
            "doc_id",
            "blk",
            F.expr(X.shingle_hashes("spark", n, toks_src="__toks")).alias(
                "sh"
            ),
        )
    )
    j = X.jaccard("spark", "a.sh", "b.sh")
    return (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(F.expr(j), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def dedup_clusters(
    pairs: DataFrame,
    left: str = "doc_a",
    right: str = "doc_b",
    max_iters: int = 50,
) -> DataFrame:
    """Resolve near-dup PAIRS into duplicate CLUSTERS: connected
    components by iterative min-label propagation, canonical id = the
    smallest doc_id in each component (the keeper-election rule every
    dedup pipeline needs downstream of candidate generation — without
    it, A~B and B~C dedupe to two overlapping pairs instead of one
    {A,B,C} group with one keeper).

    Shape: a driver loop where each round does (a) min-label
    propagation along edges (one shuffle on the node id) and (b) a
    pointer-jump — every node also adopts its label's label,
    lbl(n) <- min(lbl(n), lbl(lbl(n))) — which halves the distance any
    label still has to travel, so rounds are O(log diameter) instead of
    O(diameter) (the same doubling idea as large-star/small-star; a
    10^6-long chain converges in ~20 rounds, not 10^6). Near-dup
    clusters are shallow anyway (3-5 rounds), but the log bound is what
    makes the loop safe against adversarial chain-shaped components at
    corpus scale. Each round's label table is localCheckpointed:
    iterative lineage otherwise grows exponentially. Genuinely
    iterative, so the DuckDB oracle uses a recursive CTE instead of
    replaying the loop.

    Returns (doc_id, canonical_id) for every doc that appears in a pair.
    """
    e = pairs.select(F.col(left).alias("a"), F.col(right).alias("b"))
    edges = e.union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("a").alias("n"))
        .distinct()
        .withColumn("lbl", F.col("n"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        nbr = edges.join(
            labels.withColumnRenamed("n", "b"), "b"
        ).select(F.col("a").alias("n"), "lbl")
        prop = (
            labels.unionByName(nbr)
            .groupBy("n")
            .agg(F.min("lbl").alias("lbl"))
        )
        # pointer jump: adopt the label's own label too (labels are
        # node ids, so lbl(lbl) comes from a self-join); min() keeps it
        # monotone, left join keeps root labels (lbl(root) = root has
        # no strictly-smaller row to find)
        hop = prop.select(
            F.col("n").alias("__ln"), F.col("lbl").alias("__ll")
        )
        new = (
            prop.join(hop, prop["lbl"] == hop["__ln"], "left")
            .select(
                "n",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("__ll"), F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("x")
            .join(labels.alias("y"), "n")
            .filter(F.col("x.lbl") != F.col("y.lbl"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    else:
        # returning unconverged labels would silently split one
        # component into overlapping "clusters" — fail loudly instead
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iters} rounds "
            "(component diameter exceeds max_iters; raise it)"
        )
    return labels.select(
        F.col("n").alias("doc_id"), F.col("lbl").alias("canonical_id")
    )


def contamination_check(
    train: DataFrame,
    bench: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: which training documents share at
    least one word n-gram with the held-out evaluation set — the
    standard pre-training hygiene pass (the 13-gram overlap check of
    the GPT-3/PaLM data reports, n configurable since tiny test
    fixtures need shorter grams).

    Shape: both sides reduce to DISTINCT n-gram hashes BEFORE the join
    — the training side per document (shingle_hashes already dedups
    in-doc), the benchmark side globally. Benchmark suites are tiny
    next to a 100 TB corpus (~1e6-1e8 grams), so the bench-hash set is
    BROADCAST and the whole check is map-side: scan train, hash, probe
    the broadcast set, one hash aggregate per contaminated doc. No
    shuffle of the corpus at all. If the "benchmark" side ever is
    another corpus, drop the broadcast() and the same plan becomes a
    bucketed equi-join on the hash.

    Returns (id_col, n_shared) — only documents with >= 1 shared gram;
    n_shared counts DISTINCT shared n-grams.
    """
    th = F.expr(X.shingle_hashes("spark", n, toks_src="__toks"))
    toks = F.expr(X.tokens("spark")).alias("__toks")
    t = _widen(train).select(id_col, toks).select(
        id_col, F.explode(th).alias("__h")
    )
    b = bench.select(toks).select(F.explode(th).alias("__h")).distinct()
    return (
        t.join(F.broadcast(b), "__h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def source_overlap(
    docs: DataFrame,
    n: int = 4,
    by: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Cross-slice duplication matrix: for every pair of corpus
    slices, how much of slice A's distinct word n-gram shingle
    vocabulary also appears in slice B — the corpus-health table that
    says WHICH sources are copying which (mirrors, scrapes of
    scrapes, shared boilerplate) before any per-doc dedup runs. Both
    directed containments and the symmetric Jaccard are emitted; a
    high a-in-b with low b-in-a reads "A is a subset mirror of B".

    Scale shape: one tokenize/shingle pass -> DISTINCT (slice, hash)
    pairs (the heavy dedup happens map-side per partition first, and
    the exchange carries slice-count x vocab rows at most); the
    self-join keys on the shingle hash, where each hash matches at
    most #slices rows per side — so the pair fan-out per key is
    bounded by slices^2, NEVER by document count. One aggregate to
    slices^2 rows. The same shape at 20 sources or 20,000.

    Exact: shared-vocab counts are integers; containments in ppm by
    integer division; jaccard_u rounded from one double division.

    Returns (src_a, src_b, n_a, n_b, n_shared, a_in_b_ppm,
    b_in_a_ppm, jaccard_u) for src_a < src_b.
    """
    from go_muse_spark.functions import text as X

    staged = _widen(docs).select(
        F.col(by).alias("__s"),
        F.expr(X.tokens("spark", text_col)).alias("__toks"),
    )
    sh = staged.select(
        "__s",
        F.explode(
            F.expr(X.shingle_hashes("spark", n, toks_src="__toks"))
        ).alias("__h"),
    ).distinct()
    sh = _materialize(sh)
    sizes = sh.groupBy("__s").agg(F.count(F.lit(1)).alias("__n"))
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), F.col("a.__h") == F.col("b.__h"))
        .where(F.col("a.__s") < F.col("b.__s"))
        .groupBy(
            F.col("a.__s").alias("src_a"), F.col("b.__s").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    na = sizes.select(
        F.col("__s").alias("src_a"), F.col("__n").alias("n_a")
    )
    nb = sizes.select(
        F.col("__s").alias("src_b"), F.col("__n").alias("n_b")
    )
    out = pairs.join(F.broadcast(na), "src_a").join(
        F.broadcast(nb), "src_b"
    )
    return out.select(
        "src_a",
        "src_b",
        "n_a",
        "n_b",
        "n_shared",
        F.expr("(n_shared * 1000000) div n_a").alias("a_in_b_ppm"),
        F.expr("(n_shared * 1000000) div n_b").alias("b_in_a_ppm"),
        F.round(
            F.col("n_shared").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast(
                "double"
            )
            * 1e6,
            0,
        )
        .cast("long")
        .alias("jaccard_u"),
    )
