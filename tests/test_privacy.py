"""PII scrubbing: category counts, sequential-replacement attribution,
and the no-PII / NULL-text edges."""

from pyspark.sql import functions as F

from go_muse_spark.operators.privacy import PII_PATTERNS, scrub_pii


def test_scrub_pii_categories_and_placeholders(spark):
    rows = [
        (1, "mail me at a.b+c@test-x.org or root@sub.example.io now"),
        (2, "server 192.168.1.254 and 10.0.0.1 went down"),
        (3, "call 555-123-4567 re acct 123456789012"),
        (4, "clean text with number 42 and dots a.b"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in scrub_pii(df.fillna({"text": ""})).collect()
    }
    r1 = got[1]
    assert r1["n_email"] == 2 and r1["n_ipv4"] == 0
    assert r1["scrubbed"] == "mail me at <EMAIL> or <EMAIL> now"
    r2 = got[2]
    assert r2["n_ipv4"] == 2 and r2["n_email"] == 0
    assert r2["scrubbed"] == "server <IPV4> and <IPV4> went down"
    r3 = got[3]
    assert r3["n_phone"] == 1 and r3["n_longnum"] == 1
    assert r3["scrubbed"] == "call <PHONE> re acct <LONGNUM>"
    assert r3["n_redacted"] == 2
    r4 = got[4]
    assert r4["n_redacted"] == 0
    assert r4["scrubbed"] == rows[3][1]  # untouched
    assert got[5]["scrubbed"] == "" and got[5]["n_redacted"] == 0


def test_scrub_pii_overlap_attribution(spark):
    """A digit run inside an email: per-category counts see the raw
    text (both email and longnum count it) but the sequential replace
    attributes it to the earliest category — one placeholder, and
    n_redacted counts the running text, not the sum of categories."""
    df = spark.createDataFrame(
        [(1, "x 123456789012@example.com y")], "doc_id long, text string"
    )
    r = scrub_pii(df).collect()[0]
    assert r["n_email"] == 1
    assert r["n_longnum"] == 1  # raw-text count
    assert r["scrubbed"] == "x <EMAIL> y"  # but only one placeholder
    assert r["n_redacted"] == 1


def test_pii_patterns_re2_safe():
    """Every pattern must compile in a RE2-compatible engine (the
    DuckDB oracle) — i.e., no backrefs/lookaround."""
    import re

    for name, pat in PII_PATTERNS:
        re.compile(pat)
        assert "(?=" not in pat and "(?<" not in pat and "\\1" not in pat
