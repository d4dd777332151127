"""Sub-document (chunk-level) corpus deduplication.

Whole-document dedup (operators/dedup.py) decides keep-or-drop; real
pretraining pipelines ALSO edit documents, stripping the boilerplate
segments that repeat across a crawl (nav bars, cookie banners, license
footers) while keeping the unique prose — CCNet / RefinedWeb do this at
paragraph granularity. The corpus here is single-line, so the segment
unit is a fixed window of `chunk_words` whitespace tokens; the
algorithm is identical for newline paragraphs (swap the splitter).

Reference scope note: the go-muse reference has no text pipeline at
all — this module is part of the LLM-data-prep surface the build brief
adds on top of the reference's series operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_documents", "remove_boilerplate"]


def chunk_documents(
    docs: DataFrame,
    chunk_words: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode each document into fixed-width word chunks.

    Map-only: split -> ceil(n/W) sequence -> posexplode of the joined
    word slices. No shuffle; the chunk table is the input to any
    segment-granular pass (dedup counts here; a per-chunk langid or
    toxicity score would consume the same table).

    Returns (id_col, pos, chunk) with pos the 0-based chunk index.
    """
    if chunk_words < 1:
        raise ValueError("chunk_words must be >= 1")
    w = int(chunk_words)
    toks = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(w))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - F.lit(1)),
        lambda i: F.array_join(F.slice(toks, i * w + 1, w), " "),
    )
    return docs.select(
        F.col(id_col),
        F.posexplode(chunks).alias("pos", "chunk"),
    )


def remove_boilerplate(
    docs: DataFrame,
    chunk_words: int = 4,
    min_dup: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Strip corpus-repeated chunks from every document.

    A chunk whose exact text occurs >= min_dup times ANYWHERE in the
    corpus (other documents or elsewhere in the same one) is dropped;
    the survivors are re-joined in original order. Documents made of
    nothing but boilerplate come back as the empty string rather than
    vanishing — downstream length filters decide their fate.

    Plan shape:
      scan -> map-side chunk explode
           -> hash agg on chunk (map-side partials!)   [global dup count]
           -> equi-join counts back onto the chunks
           -> Exchange(id) + hash agg                  [ordered reassembly]
    The count is a groupBy, NOT a window count: the most frequent
    boilerplate chunk — the exact thing this operator targets, repeated
    maybe 10^9 times at crawl scale — would serialize every instance
    into one window partition, while the aggregate emits one partial
    row per distinct chunk per task and the join's residual hot-key
    probe is AQE-skew-splittable (a window partition is not). The count
    keys on the chunk STRING so the DuckDB oracle can replay it
    verbatim; at 100 TB key it on a digest — sha2(chunk, 256) for
    collision-free, xxhash64 for 8-byte keys at ~1e-11 corpus-level
    odds — as exact_dedup(by_hash="sha256") already does for whole
    docs. Reassembly carries every chunk to the doc-side aggregate with
    a kept flag instead of re-joining cleaned chunks against the doc
    list, so fully-boilerplate docs need no second pass.

    Returns (id_col, clean_text, n_chunks, n_removed).
    """
    if min_dup < 1:
        raise ValueError("min_dup must be >= 1")
    chunks = chunk_documents(docs, chunk_words, text_col, id_col)
    counts = chunks.groupBy("chunk").agg(F.count(F.lit(1)).alias("__cnt"))
    flagged = chunks.join(counts, "chunk").withColumn(
        "__kept", (F.col("__cnt") < min_dup).cast("int")
    )
    piece = F.struct(
        F.col("pos").alias("pos"),
        F.col("__kept").alias("kept"),
        F.col("chunk").alias("chunk"),
    )
    ordered = F.array_sort(F.collect_list(piece))
    return flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.filter(ordered, lambda s: s["kept"] == 1),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.lit(1) - F.col("__kept")).alias("n_removed"),
    )
