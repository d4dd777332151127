"""TF-IDF term ranking over the documents corpus.

The training-data-pipeline complement to functions/text.py's per-doc
scores: which terms CHARACTERIZE a document relative to the corpus.
Used for topic tagging, near-dup triage ("same top terms, different
hash"), and quality filtering (documents whose top terms are all
stopword-grade have low idf mass).

Plan shape at 100 TB: tokenize is a map-side explode (no shuffle);
term frequency is one hash aggregate on (doc, term) with map-side
partials; document frequency re-aggregates the (doc, term) pairs by
term (strictly smaller input); the tf x idf join shuffles on term —
vocabulary-sized keys, so hot terms are bounded by doc count and AQE
skew-split handles the head of the Zipf curve; top-k per doc is a
ranked window over the doc key. No Python anywhere — every step is
whole-stage-codegen relational ops.

Numeric contract: tf/df/N are exact integers; idf = ln(N/df) and the
tf*idf product are evaluated by the same libm on any engine reading
the same doubles, and the contract query rounds at 1e-6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "tfidf_top_terms",
    "pmi_pairs",
    "ngram_diversity",
    "unigram_logprob",
    "bm25_expr",
    "bm25_topk",
    "g2_expr",
    "keyness_topk",
    "cross_entropy_matrix",
    "repetition_ratio",
]


def tfidf_top_terms(
    docs: DataFrame,
    n_docs: int,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = " ",
) -> DataFrame:
    """Top-k terms per document by tf * ln(N/df), ties broken by term
    ascending. `n_docs` is passed in (a bounded scalar the caller
    already knows or reads once) so the plan stays a pure pipeline.

    Returns (id_col, term, tf, df, tfidf, rnk).
    """
    toks = docs.select(
        id_col, F.explode(F.split(F.col(text_col), sep)).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_t, "term").select(
        id_col,
        "term",
        "tf",
        "df",
        (
            F.col("tf")
            * F.log(F.lit(float(n_docs)) / F.col("df"))
        ).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )


def ngram_diversity(
    docs: DataFrame,
    n: int = 3,
    by: tuple[str, ...] = ("lang",),
    text_col: str = "text",
) -> DataFrame:
    """Corpus n-gram diversity per slice: total word n-gram INSTANCES
    vs DISTINCT n-grams — the type/token ratio a data-quality pass
    watches for template spam and synthetic-loop degeneration (a slice
    whose ratio collapses is repeating itself; the corpus-level cousin
    of self-BLEU).

    Shape: map-side explode of the (non-distinct) shingle list, then
    ONE aggregate per slice computing count(*) and count(DISTINCT
    gram). The distinct lands on Spark's two-phase Expand dedup —
    shuffle O(distinct grams), the unavoidable cost of an exact
    distinct; at 100 TB swap in approx_count_distinct exactly like
    cardinality.approx_distinct_rollup does for uniques. The ratio is
    ONE double division of exact int64 counts.

    Returns (by..., n_total, n_distinct, ttr) — slices whose documents
    are all shorter than n words produce no shingles and are absent.
    """
    from go_muse_spark.functions import text as X
    from go_muse_spark.operators.dedup import _widen

    sh = F.expr(X.shingles("spark", n, toks_src="__toks"))
    g = (
        _widen(docs)
        .select(*by, F.expr(X.tokens("spark", text_col)).alias("__toks"))
        .select(*by, F.explode(sh).alias("__g"))
    )
    return (
        g.groupBy(*by)
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count_distinct(F.col("__g")).alias("n_distinct"),
        )
        .withColumn(
            "ttr", F.col("n_distinct").cast("double") / F.col("n_total")
        )
    )


def unigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's OWN
    unigram language model — the cheapest corpus-statistics quality
    score: documents full of globally-rare tokens (OCR noise, boiler-
    plate hashes, wrong-language text) score far below the corpus mode
    and fall to a filter threshold. The smoothing-free model is exact
    because every token, by construction, occurs in the corpus (tf >= 1).

    Shape: explode tokens map-side; ONE hash aggregate builds the term
    frequency table; the corpus total is a 1-row broadcast; the
    token->tf lookup is a vocabulary join (key cardinality = vocab, so
    hot stopword keys are bounded by doc count — AQE skew-split
    territory, same as tfidf's df join); final per-doc aggregate.
    ln(tf/total) is one libm call on identical operands in any engine;
    the per-doc double sum is order-sensitive only at the ~1e-12 level
    (contract query rounds at 1e-6).

    Returns (id_col, n_toks, logprob).
    """
    from go_muse_spark.operators.dedup import _materialize, _widen

    wide = _widen(docs)
    toks = wide.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("__t")
    )
    # the vocab table feeds THREE consumers (join build, corpus total,
    # and transitively the broadcast) — Catalyst has no cross-consumer
    # subtree reuse, so an unmaterialized freq re-tokenizes the whole
    # corpus per consumer (verified in the plan: three parallel
    # scan+explode+agg subtrees). Materialize the vocab-sized result
    # once; production keeps it as a persisted table next to the corpus.
    freq = _materialize(
        toks.groupBy("__t").agg(F.count(F.lit(1)).alias("__tf"))
    )
    total = freq.agg(F.sum("__tf").alias("__tot"))
    scored = (
        toks.join(F.broadcast(freq), "__t")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            F.log(F.col("__tf").cast("double") / F.col("__tot")).alias(
                "__lp"
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_toks"),
        (F.sum("__lp") / F.count(F.lit(1))).alias("logprob"),
    )


def repetition_ratio(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicate n-gram fraction (the Gopher/MassiveText
    repetition rule): what share of a document's word n-gram INSTANCES
    belong to an n-gram that occurs more than once IN THAT DOCUMENT.
    The per-doc complement of ngram_diversity's slice-level type/token
    ratio — a doc near 1.0 is a template loop or copy-paste spam and
    gets dropped by the quality gate regardless of how diverse the
    rest of its slice is.

    Shape: map-side shingle explode, ONE hash aggregate on
    (doc, gram) — the key space is bounded by each doc's own length, so
    there is no hot-key risk — then a per-doc aggregate; the ratio is
    one double division of exact int64 counts. Docs shorter than n
    words have no shingles and are absent (undefined, not 0).

    Returns (id_col, n_grams, n_dup_instances, dup_ratio).
    """
    from go_muse_spark.functions import text as X
    from go_muse_spark.operators.dedup import _widen

    sh = F.expr(X.shingles("spark", n, toks_src="__toks"))
    g = (
        _widen(docs)
        .select(
            F.col(id_col),
            F.expr(X.tokens("spark", text_col)).alias("__toks"),
        )
        .select(F.col(id_col), F.explode(sh).alias("__g"))
        .groupBy(id_col, "__g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return g.groupBy(id_col).agg(
        F.sum("c").alias("n_grams"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias(
            "n_dup_instances"
        ),
        (
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).cast(
                "double"
            )
            / F.sum("c")
        ).alias("dup_ratio"),
    )


def pmi_pairs(
    docs: DataFrame,
    n_docs: int,
    top_vocab: int = 200,
    min_pair: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pointwise mutual information of token co-occurrence at document
    granularity — the collocation/phrase-mining primitive ("which words
    appear together far more than chance?") a corpus-analysis pass runs
    before building phrase vocabularies or detecting templated spam:

        pmi(a,b) = ln( (c_ab * N) / (c_a * c_b) )

    over PRESENCE counts (distinct tokens per doc), pairs emitted once
    with tok_a < tok_b, pairs below ``min_pair`` dropped.

    Scale shape: the pair space is quadratic in per-doc vocabulary, so
    the candidate set is bounded BEFORE the self-join — only the
    ``top_vocab`` most-frequent tokens participate (ties broken by
    token, so the cut is deterministic), via a broadcast semi-join;
    per-doc fanout is then <= min(doc_len, top_vocab)^2 regardless of
    corpus size. The self-join keys on the doc id (even spread), the
    pair aggregate is one hash agg with map-side partials, and the two
    unigram-count joins broadcast the vocab. Same candidate-bounding
    shape as stats.corr_pairs.

    Numeric contract: c_a, c_b, c_ab, N are exact integers; the ratio
    is one exact-operand double division and ln is the only libm call
    (contract queries round at 1e-6 — the unigram_logprob precedent).

    Returns (tok_a, tok_b, c_ab, c_a, c_b, pmi).
    """
    if top_vocab < 2:
        raise ValueError("top_vocab must be >= 2")
    toks = docs.select(
        id_col,
        F.explode(
            F.array_distinct(F.split(F.col(text_col), " "))
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    # TakeOrderedAndProject (per-partition k-heap + driver merge), not a
    # global row_number window — the vocab table is corpus-vocabulary-
    # sized and must never funnel through one task
    vocab = counts.orderBy(F.col("c").desc(), F.col("tok").asc()).limit(
        top_vocab
    )
    kept = toks.join(F.broadcast(vocab.select("tok")), "tok")
    a, b = kept.alias("a"), kept.alias("b")
    pairs = (
        a.join(b, (F.col(f"a.{id_col}") == F.col(f"b.{id_col}"))
               & (F.col("a.tok") < F.col("b.tok")))
        .groupBy(
            F.col("a.tok").alias("tok_a"), F.col("b.tok").alias("tok_b")
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_pair)
    )
    va = vocab.select(F.col("tok").alias("tok_a"), F.col("c").alias("c_a"))
    vb = vocab.select(F.col("tok").alias("tok_b"), F.col("c").alias("c_b"))
    return (
        pairs.join(F.broadcast(va), "tok_a")
        .join(F.broadcast(vb), "tok_b")
        .select(
            "tok_a",
            "tok_b",
            "c_ab",
            "c_a",
            "c_b",
            F.log(
                F.col("c_ab") * F.lit(int(n_docs))
                / (F.col("c_a") * F.col("c_b"))
            ).alias("pmi"),
        )
    )


def bm25_expr(n_expr, k1_pct: int = 120, b_pct: int = 75) -> str:
    """Okapi BM25 per-(doc, term) contribution as ONE dialect-neutral
    SQL scalar over exact integer inputs (tf, df, dl, total_len) —
    the Lucene-style idf ln(1 + (N-df+0.5)/(df+0.5)), k1/b carried as
    exact percent rationals. Both engines evaluate this identical
    IEEE tree (the pmi/unigram_logprob precedent: ln is the only
    libm call, divisions on identical operands), so scores replay
    bit-for-bit and contract queries can round at 1e-6.

    ``n_expr`` is the corpus-size N as SQL text — a literal on the
    Spark side, a scalar subquery/CTE column in an oracle; identical
    VALUES give identical trees either way. avgdl never materializes:
    dl/avgdl is written dl*N/total_len so every operand stays an
    exact int64 before the one division.
    """
    n = str(n_expr)
    k1 = f"({k1_pct}.0 / 100.0)"
    b = f"({b_pct}.0 / 100.0)"
    idf = (
        f"ln(1.0 + (cast(({n}) - df as double) + 0.5)"
        f" / (cast(df as double) + 0.5))"
    )
    denom = (
        f"(cast(tf as double) + {k1} * (1.0 - {b}"
        f" + {b} * cast(dl as double) * cast(({n}) as double)"
        f" / cast(total_len as double)))"
    )
    return (
        f"{idf} * (cast(tf as double) * ({k1} + 1.0)) / {denom}"
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    n_docs: int,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = " ",
    k1_pct: int = 120,
    b_pct: int = 75,
) -> DataFrame:
    """Okapi BM25 ranked retrieval of the top-k documents for a bag of
    query terms — the lexical-search baseline every training-corpus
    curation loop runs next to its embedding ANN ("find me documents
    about X" without a model in the loop). tf saturates via k1 and
    long documents are penalized via b, which is what separates this
    from the tf-idf ranker above.

    Scale shape: the token explode filters to the query terms BEFORE
    aggregating, so the tf table is O(docs containing a query term),
    not O(corpus tokens); df is a per-term aggregate of that same
    tiny table, broadcast back; dl (per-doc token count) is a
    map-side array size, no explode. The final top-k is
    orderBy(score desc, id).limit(k) — TakeOrderedAndProject, one
    reduce, no full sort. Ties at equal score break to id ascending.

    Returns (id_col, n_hit, score) — score the summed BM25, n_hit how
    many distinct query terms matched.
    """
    if not query_terms:
        raise ValueError("need at least one query term")
    qlit = F.array(*[F.lit(t) for t in query_terms])
    base = docs.select(
        id_col,
        F.expr(
            f"size(filter(split({text_col}, '{sep}'), x -> x != ''))"
        ).alias("dl"),
        F.filter(
            F.split(F.col(text_col), sep),
            lambda x: F.array_contains(qlit, x),
        ).alias("__hits"),
    )
    tl = base.select(F.sum("dl").alias("total_len"))
    tf = (
        base.select(id_col, "dl", F.explode("__hits").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(tl))
        .withColumn(
            "__s", F.expr(bm25_expr(int(n_docs), k1_pct, b_pct))
        )
    )
    # order-deterministic float sum: fold the per-term contributions
    # in TERM order (sorted struct array), never shuffle-arrival order
    # — the oracle replays sum(s ORDER BY term), the identical
    # left-associated chain (0.0 + s1 == s1 exactly)
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_hit"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("term").alias("t"), F.col("__s").alias("s")
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["s"],
        ).alias("score"),
    )
    return agg.orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    ).limit(int(k))


def g2_expr() -> str:
    """Dunning log-likelihood (G^2) keyness of a term in a slice vs
    the rest of the corpus, as ONE dialect-neutral SQL scalar over
    exact integer columns (a = term count in slice, b = in rest,
    na/nb = slice/rest token totals). Expected counts never
    materialize as separate rounding sites: each x*ln(x/E) is written
    x * ln(x * (na+nb) / (total * nx)) so every operand of the one
    division chain is an exact int64 product (the pmi precedent —
    ln the only libm call, identical tree in both engines). Zero
    cells contribute 0 by the x->0 limit. Signed: positive when the
    slice OVERuses the term.
    """
    t = "(cast(a as double) + cast(b as double))"
    la = (
        "CASE WHEN a > 0 THEN cast(a as double) * ln("
        "cast(a as double) * (cast(na as double) + cast(nb as double))"
        f" / ({t} * cast(na as double))) ELSE 0.0 END"
    )
    lb = (
        "CASE WHEN b > 0 THEN cast(b as double) * ln("
        "cast(b as double) * (cast(na as double) + cast(nb as double))"
        f" / ({t} * cast(nb as double))) ELSE 0.0 END"
    )
    sign = (
        "CASE WHEN cast(a as double) * cast(nb as double)"
        " >= cast(b as double) * cast(na as double)"
        " THEN 1.0 ELSE -1.0 END"
    )
    return f"{sign} * 2.0 * (({la}) + ({lb}))"


def keyness_topk(
    docs: DataFrame,
    by: str = "source",
    k: int = 5,
    text_col: str = "text",
    sep: str = " ",
) -> DataFrame:
    """Top-k terms most CHARACTERISTIC of each corpus slice by Dunning
    G^2 keyness — "what vocabulary separates this source from the
    rest?", the corpus-linguistics standard that, unlike raw tf-idf,
    is calibrated (G^2 is a likelihood-ratio statistic): the per-slice
    fingerprint a training-data curator reads before up/down-weighting
    a source. Positive G^2 only (overuse), ties to term ascending.

    Scale shape: one tokenize explode; ONE hash aggregate to
    (slice, term) counts; corpus-wide term totals re-aggregate that
    (strictly smaller) table; slice token totals are a tiny broadcast.
    b = corpus - slice count needs no second scan. Top-k is a ranked
    window over the slice key.

    Returns (by, term, a, b, na, nb, g2).
    """
    from go_muse_spark.operators.dedup import _materialize

    toks = docs.select(
        F.col(by), F.explode(F.split(F.col(text_col), sep)).alias("term")
    ).filter(F.col("term") != "")
    # (slice, term) counts feed THREE consumers (scored join, corpus
    # totals, slice totals) — materialize the vocab-sized result once
    # or Catalyst re-tokenizes the corpus per consumer (the
    # unigram_logprob diamond, verified there in the plan)
    tf = _materialize(
        toks.groupBy(by, "term").agg(F.count(F.lit(1)).alias("a"))
    )
    corpus = tf.groupBy("term").agg(F.sum("a").alias("__ct"))
    slice_tot = tf.groupBy(by).agg(F.sum("a").alias("na"))
    all_tot = slice_tot.agg(F.sum("na").alias("__nt"))
    scored = (
        tf.join(F.broadcast(corpus), "term")
        .join(F.broadcast(slice_tot), by)
        .crossJoin(F.broadcast(all_tot))
        .select(
            by,
            "term",
            "a",
            (F.col("__ct") - F.col("a")).alias("b"),
            "na",
            (F.col("__nt") - F.col("na")).alias("nb"),
        )
        .withColumn("g2", F.expr(g2_expr()))
    )
    w = Window.partitionBy(by).orderBy(
        F.col("g2").desc(), F.col("term").asc()
    )
    return (
        scored.where(F.col("g2") > 0)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= int(k))
        .drop("rnk")
    )


def cross_entropy_matrix(
    docs: DataFrame,
    by: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Domain-mismatch matrix: for every ordered slice pair (model A,
    data B), the unigram cross-entropy H(B; A) = -sum_t p_B(t) ln
    q_A(t) with add-one smoothing over the corpus vocabulary — "how
    surprised is source A's language model by source B's text". The
    diagonal-adjusted kl_u = H(B; A) - H(B; B) reads directly as
    domain distance (0 on the diagonal by construction); the curation
    use is spotting sources whose text another source already covers
    (low KL both ways) vs genuinely novel slices.

    Numerics: all counts exact int64; q_A(t) = (cnt_A(t)+1) /
    (tot_A + V) with V the corpus vocabulary size, so every term —
    including those A never saw — has positive mass and the sum is
    finite. p_B uses B's exact empirical distribution. ln on
    identical operands; the per-pair sum is a plain float aggregate
    over vocabulary terms (the unigram_logprob precedent: ~1e-16/op
    jitter, far inside the 1e-6 contract grid).

    Scale shape: ONE tokenize pass -> (slice, term) counts
    (materialized, feeds everything); data-side rows join the
    slice list (S rows, broadcast) and left-join model counts on
    (term, model) — V x S^2 join rows, bounded by vocabulary x
    slice-pair count, never by documents. One aggregate to S^2 rows.

    Returns (model_src, data_src, n_terms_b, h_cross_u, kl_u).
    """
    from go_muse_spark.operators.dedup import _materialize

    toks = docs.select(
        F.col(by).alias("__s"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    tf = _materialize(
        toks.groupBy("__s", "term").agg(F.count(F.lit(1)).alias("n"))
    )
    tot = tf.groupBy("__s").agg(F.sum("n").alias("tot"))
    vocab = tf.select("term").distinct().agg(
        F.count(F.lit(1)).alias("v")
    )
    slices = tot.select(
        F.col("__s").alias("model_src"), F.col("tot").alias("tot_a")
    )
    data = tf.select(
        F.col("__s").alias("data_src"), "term", F.col("n").alias("n_b")
    ).join(
        tot.select(
            F.col("__s").alias("data_src"), F.col("tot").alias("tot_b")
        ),
        "data_src",
    )
    grid = data.crossJoin(F.broadcast(slices)).join(
        F.broadcast(
            tf.select(
                F.col("__s").alias("model_src"),
                "term",
                F.col("n").alias("n_a"),
            )
        ),
        ["model_src", "term"],
        "left",
    )
    term_expr = (
        "-(cast(n_b as double) / cast(tot_b as double))"
        " * ln(cast(coalesce(n_a, 0) + 1 as double)"
        " / cast(tot_a + v as double))"
    )
    scored = grid.crossJoin(F.broadcast(vocab)).withColumn(
        "__t", F.expr(term_expr)
    )
    h = scored.groupBy("model_src", "data_src").agg(
        F.count(F.lit(1)).alias("n_terms_b"),
        F.sum("__t").alias("h_cross"),
    )
    self_h = h.where(
        F.col("model_src") == F.col("data_src")
    ).select(
        F.col("data_src").alias("__ds"),
        F.col("h_cross").alias("__h_self"),
    )
    return (
        h.join(F.broadcast(self_h), h["data_src"] == F.col("__ds"))
        .select(
            "model_src",
            "data_src",
            "n_terms_b",
            F.round(F.col("h_cross") * 1e6, 0)
            .cast("long")
            .alias("h_cross_u"),
            F.round((F.col("h_cross") - F.col("__h_self")) * 1e6, 0)
            .cast("long")
            .alias("kl_u"),
        )
    )
