"""Similarity search over an embedding column (array<float64>).

Brute-force cosine top-K as the exact baseline; deterministic random-
hyperplane LSH bucketing as the scale path (candidates shrink from N to
one bucket; at 10^12 rows you'd multi-probe neighboring buckets and
partition the index by bucket prefix). All math is dual-dialect exact
(functions/text.py LCG hyperplanes), so both paths have DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_muse_spark.functions import text as X

__all__ = [
    "cosine_topk",
    "lsh_buckets",
    "ann_lsh_topk",
    "ivf_assignments",
    "ann_ivf_topk",
    "derive_planes",
    "embedding_near_dups",
    "kmeans_step",
]


def _cosine(a: str, b: str, dims: int) -> F.Column:
    dot = X.dot_product("spark", a, b, dims)
    na = X.dot_product("spark", a, a, dims)
    nb = X.dot_product("spark", b, b, dims)
    return F.expr(f"({dot}) / (sqrt({na}) * sqrt({nb}))")


def _flat_matrix(col, n: int, dims: int):
    """Arrow list<float> column -> ((n, dims) float64 matrix, valid bool[n]).

    The fast path is the zero-copy flat-buffer reshape — but a single
    NULL or ragged (len != dims) row would either crash the reshape or,
    worse, silently SHIFT every later row's coordinates. Such rows get
    a zero row and valid=False instead; downstream they norm to 0 and
    fall out as NULL / below-threshold, matching the SQL expression
    path's NULL-cosine semantics."""
    import numpy as np
    import pyarrow as pa

    arr = col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):  # older pyarrow keeps the type
        arr = (
            arr.chunk(0) if arr.num_chunks == 1
            else pa.concat_arrays(arr.chunks)
        )
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offsets)
    nulls = arr.is_null().to_numpy(zero_copy_only=False)
    valid = (~nulls) & (lens == dims)
    vals = arr.values.to_numpy(zero_copy_only=False)
    if valid.all():
        return vals.reshape(n, dims).astype(np.float64), valid
    M = np.zeros((n, dims), dtype=np.float64)
    idx = np.flatnonzero(valid)
    if len(idx):
        gather = offsets[idx][:, None] + np.arange(dims)[None, :]
        M[idx] = vals[gather]
    return M, valid


def _round6_half_away(x):
    """round(x, 6) with DuckDB/Spark tie semantics (half AWAY from
    zero); np.round's half-to-even would diverge from the oracle when
    the float64 quotient lands exactly on a 5e-7 tie. NaN passes
    through."""
    import numpy as np

    return np.trunc(x * 1e6 + np.copysign(0.5, x)) / 1e6


def cosine_topk(
    emb: DataFrame, query_vec_id: int = 0, k: int = 20, dims: int = 64
) -> DataFrame:
    """Exact brute-force cosine top-K vs one stored vector — the
    full-scan baseline, so the scan must run at bandwidth, not at
    interpreted-expression speed: mapInArrow with one BLAS matvec per
    Arrow batch (zero-copy flat-buffer reshape), no exchange at all,
    then TakeOrderedAndProject. Cosines use the same 1e-6-quantized
    exact-int64 arithmetic as embedding_near_dups, so the vectorized
    sum is order-independent and the DuckDB oracle's sequential fold
    matches bit for bit. The query vector is one bounded driver read,
    broadcast to every task."""
    import numpy as np
    import pyarrow as pa

    spark = emb.sparkSession
    row = (
        emb.filter(F.col("vec_id") == query_vec_id)
        .select("embedding")
        .collect()
    )
    if not row:
        raise ValueError(f"query vec_id {query_vec_id!r} not found")
    qv = np.rint(np.asarray(row[0][0], dtype=np.float64) * 1e6)
    nq = float(np.sqrt(qv @ qv))
    bc = spark.sparkContext.broadcast((qv, nq))
    id_t = dict(emb.dtypes)["vec_id"]

    def score(batches):
        q, qn = bc.value
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            M, _valid = _flat_matrix(batch.column("embedding"), n, dims)
            Q = np.rint(M * 1e6)
            norms = np.sqrt(np.einsum("ij,ij->i", Q, Q))
            with np.errstate(divide="ignore", invalid="ignore"):
                c = _round6_half_away((Q @ q) / (norms * qn))
            # zero-norm / NULL / ragged rows -> NULL (not NaN: Spark
            # sorts NaN as the GREATEST double, which would corrupt the
            # top-K; the old SQL division produced NULL, which sorts
            # last under desc)
            cos = pa.array(c, type=pa.float64(), from_pandas=True)
            yield pa.record_batch(
                [batch.column("vec_id"), cos], names=["vec_id", "cosine"]
            )

    scored = emb.filter(F.col("vec_id") != query_vec_id).select(
        "vec_id", "embedding"
    ).mapInArrow(score, f"vec_id {id_t}, cosine double")
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(k)


def lsh_buckets(
    emb: DataFrame, planes: int = 16, dims: int = 64
) -> DataFrame:
    """Deterministic hyperplane LSH bucket per vector (JVM expression)."""
    return emb.select(
        "vec_id",
        "embedding",
        F.expr(X.hyperplane_bucket("spark", "embedding", planes, dims)).alias(
            "bucket"
        ),
    )


def ann_lsh_topk(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    planes: int = 8,
    dims: int = 64,
    multi_probe: bool = False,
) -> DataFrame:
    """Approximate NN: cosine top-K restricted to the query's LSH bucket.

    planes=8 => 256 buckets; the candidate set is ~N/256 of the table.
    Recall/cost trades with `planes`; multi_probe=True also scans the
    `planes` buckets at hamming distance 1 from the query's (each sign
    bit flipped once) — the standard recall boost for vectors near a
    hyperplane, at (planes+1)/1 probe cost. The probe set is tiny and
    broadcast, so the scan stays map-only at any table size.
    """
    b = lsh_buckets(emb, planes, dims)
    q = b.filter(F.col("vec_id") == query_vec_id).select(
        F.col("bucket").alias("q_bucket"), F.col("embedding").alias("q_emb")
    )
    if multi_probe:
        probes = F.array(
            F.col("q_bucket"),
            *[
                F.col("q_bucket").bitwiseXOR(F.lit(1 << i))
                for i in range(planes)
            ],
        )
        cond = F.array_contains(probes, F.col("bucket"))
    else:
        cond = F.col("bucket") == F.col("q_bucket")
    cands = (
        b.filter(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(q), cond)
        .select(
            "vec_id",
            F.round(_cosine("embedding", "q_emb", dims), 6).alias("cosine"),
        )
    )
    return cands.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(k)


def _lit_arr(vals) -> str:
    """SQL double-array literal via string-cast (repr round-trips the
    exact IEEE double; a bare decimal literal would parse as DECIMAL)."""
    return (
        "array("
        + ", ".join(f"cast('{float(v)!r}' as double)" for v in vals)
        + ")"
    )


def ivf_assignments(
    emb: DataFrame, n_centroids: int = 8, dims: int = 64
) -> DataFrame:
    """IVF coarse quantizer: assign every vector to its nearest centroid.

    Centroids are a deterministic sample of stored vectors (vec_id <
    n_centroids — the random-sample initialization every k-means starts
    from, kept as-is so the assignment is reproducible and SQL-checkable;
    production would run a few sampled k-means rounds and C ~ sqrt(N)).

    The C centroid vectors are tiny, so they are collected once and
    inlined as literals: the per-row argmax over C cosines is then a
    ROW-LOCAL expression (array_max over (sim, -cid) structs — max sim,
    ties to the lowest cid) and the index build is a single map-only
    scan with NO exchange. The windowed alternative (cross-join + rank)
    shuffles the wide embedding column once per build — pure waste at
    10^12 rows for what is row-local arithmetic. Catalyst constant-folds
    the centroid norms at plan time.

    Returns (vec_id, embedding, cid).
    """
    cents = (
        emb.filter(F.col("vec_id") < n_centroids)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    # the row's own norm is hoisted to one column (it would otherwise be
    # recomputed — a 64-term fold — once per centroid entry; Catalyst
    # does not CSE across lambda folds). Same IEEE ops as the oracle's
    # dot(e,c) / (sqrt(dot(e,e)) * sqrt(dot(c,c))), just computed once.
    selfn = f"sqrt({X.dot_product('spark', 'embedding', 'embedding', dims)})"
    pre = emb.select(
        "vec_id", "embedding", F.expr(selfn).alias("__selfn")
    )
    entries = []
    for r in cents:
        c = _lit_arr(r["embedding"])
        sim = (
            f"(({X.dot_product('spark', 'embedding', c, dims)})"
            f" / (__selfn * sqrt({X.dot_product('spark', c, c, dims)})))"
        )
        # zero-norm guard: a zero vector (row or centroid) makes the
        # cosine 0/0 -> NULL, and a NULL field inside the argmax struct
        # would silently drop the row from the index. coalesce to -2.0
        # (below any real cosine) so every sim stays comparable; a
        # zero-norm ROW then lands deterministically on the lowest cid
        # (all sims equal -> max negcid wins), and a zero-norm CENTROID
        # is never preferred over a real one.
        entries.append(
            f"struct(coalesce({sim}, cast(-2.0 as double)) as sim,"
            f" {-int(r['vec_id'])} as negcid)"
        )
    best = f"array_max(array({', '.join(entries)}))"
    return pre.select(
        "vec_id",
        "embedding",
        F.expr(f"-(({best}).negcid)").cast("long").alias("cid"),
    )


def ann_ivf_topk(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    dims: int = 64,
) -> DataFrame:
    """IVF approximate NN: scan only the query's n_probe nearest inverted
    lists, exact cosine within them.

    The complement of the LSH path: data-dependent partitions (vectors
    cluster around centroids) instead of data-oblivious hyperplanes.
    Recall/cost trades with n_probe; at scale the assignment table is the
    persisted index, partitioned by cid, so a probe is a partition-pruned
    scan (candidates ~ n_probe * N / C), never a full pass.
    """
    from pyspark.sql import Window

    asg = ivf_assignments(emb, n_centroids, dims)
    c = emb.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cemb")
    )
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb")
    )
    wq = Window.orderBy(F.col("qsim").desc(), F.col("cid"))
    probes = (
        c.join(F.broadcast(q))
        .select("cid", _cosine("cemb", "q_emb", dims).alias("qsim"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("cid")
    )
    cands = (
        asg.join(F.broadcast(probes), "cid")
        .filter(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(q))
        .select(
            "vec_id",
            F.round(_cosine("embedding", "q_emb", dims), 6).alias("cosine"),
        )
    )
    return cands.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(k)


def derive_planes(
    n_rows: int, target_bucket_size: int = 64, min_planes: int = 4
) -> int:
    """Plane count such that expected bucket population ~ target.

    Within-bucket pair generation is quadratic in bucket population, so
    planes MUST grow with N: buckets = 2^planes ~ N / target keeps the
    per-bucket join fan-out bounded (~target^2/2 pairs) at any table
    size. 10^12 rows / target 64 -> 34 planes (16G buckets) — still one
    cheap integer column.
    """
    import math

    if n_rows <= target_bucket_size:
        return min_planes
    return max(min_planes, math.ceil(math.log2(n_rows / target_bucket_size)))


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.3,
    planes: int | None = None,
    dims: int = 64,
    target_bucket_size: int = 64,
    multi_probe: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucket blocked.

    Pairs sharing a hyperplane bucket are scored exactly (JVM fold, no
    Python). planes=None derives the bucket count from the table size
    (buckets ~ N / target_bucket_size) so within-bucket pairing stays
    ~target_bucket_size^2/2 per bucket at ANY scale — a fixed small
    plane count (e.g. 4 => 16 buckets) makes the equi-join a cartesian
    in disguise at 10^12 rows. The equi-join on bucket shuffles each
    bucket together; AQE's skew-join splits hot buckets.

    multi_probe=True recovers the recall a finer bucketing gives up:
    the probe side is exploded over its bucket plus all hamming-1
    neighbor buckets (one sign bit flipped), so pairs whose buckets
    differ by a single hyperplane still meet. Each qualifying pair meets
    on exactly one probe (its bucket XOR is 0 or one bit), so no dedup
    pass is needed; fan-out is a linear (planes+1)x on one narrow side.

    Scoring shape: per-probe-bucket grouped-map pandas (Arrow batches),
    ONE float64 BLAS matmul per bucket over 1e-6-QUANTIZED coordinates —
    the quantized dot is an exact, order-independent int64 (partial sums
    < 2^53, every float64 partial is integer-exact), so the vectorized
    path is engine-exact against a sequential SQL fold (the trick
    kmeans_step uses for its centroid sums). The interpreted per-pair
    expression fold this replaces measured ~20x slower at 150k vectors
    (each vector scores ~(planes+1)*target/2 candidates); the group
    shuffle moves (planes+2)x narrow rows and NEVER materializes the
    candidate-pair table. Cosines move by <= ~1e-4 vs unquantized (unit
    vectors) — noise at near-dup thresholds.

    Recall/cost: a cosine-theta pair collides on one plane with
    p = 1 - theta/pi, so a same-bucket hit is p^planes and the
    hamming-<=1 probe set catches p^planes * (1 + planes*(1-p)/p).
    Near-dups at cosine 0.9 (p ~ 0.857): planes=8 -> 0.29 same-bucket,
    0.68 with multi-probe; the derived planes=log2(N/target) trades
    exactly this recall against the bounded ~target^2/2 per-bucket
    pairing cost, so at higher N (more planes) multi_probe=True is the
    recommended default. Measured floors live in
    tests/test_dedup_similarity.py (ANN recall section).
    """
    import numpy as np
    import pyarrow as pa

    # malformed vectors (NULL / wrong length) are data errors to drop,
    # not crash on: the hyperplane expression indexes embedding[d] and
    # ANSI mode faults on short arrays; the Arrow reshape guards itself
    # but would still pair garbage
    emb = emb.filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == dims)
    )
    if planes is None:
        planes = derive_planes(emb.count(), target_bucket_size)
    b = lsh_buckets(emb, planes, dims)
    # side 1 = bucket members (join targets), side 0 = probes
    right = b.select(
        F.col("bucket").alias("probe"),
        "vec_id",
        "embedding",
        F.lit(1).alias("side"),
    )
    if multi_probe:
        flips = F.array(F.lit(0), *[F.lit(1 << i) for i in range(planes)])
        left = b.select(
            "vec_id", "embedding", "bucket", F.explode(flips).alias("flip")
        ).select(
            F.col("bucket").bitwiseXOR(F.col("flip")).alias("probe"),
            "vec_id",
            "embedding",
            F.lit(0).alias("side"),
        )
    else:
        left = b.select(
            F.col("bucket").alias("probe"),
            "vec_id",
            "embedding",
            F.lit(0).alias("side"),
        )
    # Hot-bucket salting: derive_planes bounds the EXPECTED population,
    # but real embeddings cluster (even this repo's uniform synthetic
    # corpus showed a 56x-over-average bucket), and one hot bucket is
    # one serial task. Buckets over `cap` members split their MEMBER
    # side into ceil(count/cap) salts (hash(vec_id), deterministic);
    # the probe side replicates across that bucket's salts. Pair-once
    # semantics are untouched — the salts partition each (probe,
    # member-set) group disjointly. Two broadcast joins on the small
    # over-cap bucket list; no driver collect, any hot-set size.
    cap = 8 * target_bucket_size
    hot = (
        b.groupBy(F.col("bucket").alias("probe"))
        .count()
        .filter(F.col("count") > cap)
        .select(
            "probe",
            F.ceil(F.col("count") / cap).cast("int").alias("__ns"),
        )
    )
    ns = F.coalesce(F.col("__ns"), F.lit(1))
    right = (
        right.join(F.broadcast(hot), "probe", "left")
        .withColumn("salt", F.pmod(F.hash("vec_id"), ns))
        .drop("__ns")
    )
    left = (
        left.join(F.broadcast(hot), "probe", "left")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), ns - 1)))
        .drop("__ns")
    )
    both = left.unionByName(right)
    id_t = dict(emb.dtypes)["vec_id"]
    thr = float(threshold)
    out_fields = [("vec_a", id_t), ("vec_b", id_t), ("cosine", "double")]
    block = 8192  # probe-row blocking bounds the C matrix at block*cap

    def score_bucket(tbl: "pa.Table") -> "pa.Table":
        # zero-copy-ish: the list<float> column's flat values buffer
        # reshapes straight into an (n, dims) matrix — no per-row
        # object stacking (measured ~2x of the whole operator's wall)
        n = tbl.num_rows
        out_schema = pa.schema(
            [
                ("vec_a", tbl.schema.field("vec_id").type),
                ("vec_b", tbl.schema.field("vec_id").type),
                ("cosine", pa.float64()),
            ]
        )
        empty = pa.table(
            {"vec_a": [], "vec_b": [], "cosine": []}, schema=out_schema
        )
        if n == 0:
            return empty
        side = tbl.column("side").to_numpy()
        M, _valid = _flat_matrix(tbl.column("embedding"), n, dims)
        ids = tbl.column("vec_id").to_numpy()
        pm = side == 0
        if not pm.any() or pm.all():
            return empty
        # 1e-6-quantized coordinates as integer-valued float64: every
        # partial sum stays < 2^53, hence integer-exact and order-
        # independent — identical to the oracle's sequential int64 fold
        Q = np.rint(M * 1e6)
        A, B = Q[pm], Q[~pm]
        ia, ib = ids[pm], ids[~pm]
        nb = np.sqrt(np.einsum("ij,ij->i", B, B))
        na = np.sqrt(np.einsum("ij,ij->i", A, A))
        outs_a, outs_b, outs_c = [], [], []
        for s in range(0, len(A), block):
            Ab, nab, iab = A[s : s + block], na[s : s + block], ia[s : s + block]
            with np.errstate(divide="ignore", invalid="ignore"):
                C = (Ab @ B.T) / np.outer(nab, nb)
            C = _round6_half_away(C)
            # a<b keeps each qualifying pair exactly once (docstring);
            # NaN cosines (zero-norm side) fail the >= and drop out
            with np.errstate(invalid="ignore"):
                mask = (iab[:, None] < ib[None, :]) & (C >= thr)
            ii, jj = np.nonzero(mask)
            if len(ii):
                outs_a.append(iab[ii])
                outs_b.append(ib[jj])
                outs_c.append(C[ii, jj])
        if not outs_a:
            return empty
        return pa.table(
            {
                "vec_a": np.concatenate(outs_a),
                "vec_b": np.concatenate(outs_b),
                "cosine": np.concatenate(outs_c),
            },
            schema=out_schema,
        )

    return both.groupBy("probe", "salt").applyInArrow(
        score_bucket, ", ".join(f"{c} {t}" for c, t in out_fields)
    )


def kmeans_step(
    emb: DataFrame, n_centroids: int = 8, dims: int = 64
) -> DataFrame:
    """One Lloyd iteration of k-means over the embedding table: assign
    every vector to its nearest current centroid (ivf_assignments — a
    map-only scan, centroids inlined as literals), then recompute each
    centroid as the per-dimension mean of its members. Iterating this
    operator IS k-means; one step is exposed because each round is an
    independent, restartable Spark job at 100 TB (centroids checkpoint
    between rounds; the driver loop is K tiny collect()s, never data).

    Numeric contract: member coordinates are quantized to 1e-6
    (float32 -> exact int64), so the per-cluster sums are
    order-independent and the mean is ONE double division + round —
    engine-exact, unlike a naive avg(float) whose accumulation order
    differs per engine.

    Scale shape: map-only assignment (no exchange) -> posexplode (map-
    side, x dims fan-out) -> ONE hash aggregate onto C x dims cells
    with map-side partials. Shuffle volume O(partitions x C x dims),
    independent of row count. Returns (cid, dim, n, sum_q, mean_q);
    n is the cluster population (same for every dim of a cid).
    """
    assigned = ivf_assignments(emb, n_centroids, dims)
    ex = assigned.select(
        "cid", F.posexplode("embedding").alias("dim", "__x")
    )
    q = F.expr("cast(round(cast(__x as double) * 1000000) as bigint)")
    return (
        ex.groupBy("cid", "dim")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(q).alias("sum_q"))
        .withColumn(
            "mean_q", F.round(F.col("sum_q") / F.col("n"), 0).cast("long")
        )
    )
