"""source_overlap: hand-built slice vocabularies, directed containment."""

import pytest

from go_muse_spark.operators.dedup import source_overlap


def test_mirror_detection(spark):
    # B contains everything A says (mirror) plus extra; C is disjoint
    docs = [
        (0, "A", "one two three four five"),
        (1, "B", "one two three four five six seven eight"),
        (2, "C", "nine ten eleven twelve thirteen"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    out = {
        (r["src_a"], r["src_b"]): r
        for r in source_overlap(df, n=3, by="source").collect()
    }
    ab = out[("A", "B")]
    # A's 3 distinct 3-gram shingles all appear in B
    assert ab["n_a"] == 3 and ab["n_shared"] == 3
    assert ab["a_in_b_ppm"] == 1_000_000
    assert ab["b_in_a_ppm"] < 1_000_000  # B has extra shingles
    # disjoint pairs don't emit rows (inner join on shared hashes)
    assert ("A", "C") not in out and ("B", "C") not in out


def test_jaccard_formula(spark):
    docs = [
        (0, "X", "a b c d"),        # shingles: abc, bcd
        (1, "Y", "b c d e"),        # shingles: bcd, cde
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    r = source_overlap(df, n=3, by="source").collect()[0]
    assert (r["n_a"], r["n_b"], r["n_shared"]) == (2, 2, 1)
    assert r["jaccard_u"] == pytest.approx(round(1 / 3 * 1e6), abs=1)


def test_duplicate_docs_count_once(spark):
    # distinct shingle vocab per slice: repeating a doc changes nothing
    docs = [
        (0, "X", "a b c d"),
        (1, "X", "a b c d"),
        (2, "Y", "b c d e"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    r = source_overlap(df, n=3, by="source").collect()[0]
    assert (r["n_a"], r["n_b"], r["n_shared"]) == (2, 2, 1)
