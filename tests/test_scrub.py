"""PII scrubbing (functions/scrub.py): hand-built category/order/edge
semantics plus the Spark-vs-DuckDB rewrite differential on adversarial
strings (the sf fixtures contain no PII, so the catalog differential alone
only proves the identity rewrite)."""

import duckdb
import pandas as pd

from hdfs2cass_spark.functions.scrub import PII_PATTERNS, scrub_cte_duck, scrub_pii

CASES = [
    (0, "contact me@example.com or http://x.io/a?b=1 from 192.168.0.1 call +1 555-123-4567 end"),
    (1, None),
    (2, ""),
    (3, "plain words only"),
    # URL swallows its embedded user@host BEFORE the email pass; a
    # unicode-domain address is NOT an email (ASCII class); 999.* still
    # IP-shaped by the naive octet pattern; a bare 11-digit run is
    # phone-shaped
    (4, "http://u:p@h.com/x me@例.com 999.999.999.999 12345678901"),
    (5, "a@b.co a@b.co twice and 10.0.0.1 10.0.0.2"),
    # IP scrubbed before the phone pass: the placeholder has no digits, so
    # the dotted quad can't double-count as a phone
    (6, "dial 10.0.0.1 now"),
]


def _cols(r):
    return (r["doc_id"], r["n_urls"], r["n_emails"], r["n_ips"], r["n_phones"], r["scrubbed"])


def test_scrub_matches_duckdb_on_planted_pii(spark):
    df = spark.createDataFrame(CASES, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in scrub_pii(df)
        .select("doc_id", "n_urls", "n_emails", "n_ips", "n_phones", "scrubbed")
        .collect()
    }
    con = duckdb.connect()
    con.register("documents_pd", pd.DataFrame(CASES, columns=["doc_id", "text"]))
    con.sql("CREATE VIEW documents AS SELECT * FROM documents_pd")
    want = con.sql(scrub_cte_duck() + " ORDER BY doc_id").df().to_dict("records")
    assert len(want) == len(CASES)
    for w in want:
        g = got[w["doc_id"]]
        assert (g.n_urls, g.n_emails, g.n_ips, g.n_phones, g.scrubbed) == (
            None if pd.isna(w["n_urls"]) else w["n_urls"],
            None if pd.isna(w["n_emails"]) else w["n_emails"],
            None if pd.isna(w["n_ips"]) else w["n_ips"],
            None if pd.isna(w["n_phones"]) else w["n_phones"],
            None if w["scrubbed"] is None else w["scrubbed"],
        )


def test_scrub_semantics_pinned(spark):
    df = spark.createDataFrame(CASES, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in scrub_pii(df)
        .select("doc_id", "n_urls", "n_emails", "n_ips", "n_phones", "scrubbed")
        .collect()
    }
    assert got[0].scrubbed == "contact <EMAIL> or <URL> from <IP> call <PHONE> end"
    assert (got[1].n_urls, got[1].scrubbed) == (None, None)  # NULL propagates
    assert (got[2].n_urls, got[2].scrubbed) == (0, "")
    assert got[4].scrubbed == "<URL> me@例.com <IP> <PHONE>"
    assert (got[4].n_urls, got[4].n_emails) == (1, 0)  # user@host inside URL
    assert (got[5].n_emails, got[5].n_ips) == (2, 2)
    assert (got[6].n_ips, got[6].n_phones) == (1, 0)  # IP never re-counts as phone
    assert got[6].scrubbed == "dial <IP> now"


def test_patterns_are_re2_and_java_safe():
    """No construct where Java regex and RE2 diverge: backrefs, lookaround,
    possessive/atomic groups, non-ASCII classes."""
    for _, pat, _ in PII_PATTERNS:
        for banned in ("(?=", "(?!", "(?<", "\\1", "*+", "++", "?+", "(?>"):
            assert banned not in pat, (pat, banned)
