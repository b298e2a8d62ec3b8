"""Differential check of the PII/URL regex surfaces: Spark's Java regex
engine vs DuckDB's RE2 must agree on every pattern for arbitrary text —
the oracle contract (`q_pii_scrub` / `q_url_stats`) depends on it.

Seeded-random corpora deliberately mix near-miss shapes (trailing dots,
numeric hosts, over-long phone digits, punctuation-glued emails) with
genuine matches."""

import random

import duckdb
import pytest

from datayours_spark.functions.text import PII_PATTERNS, URL_PATTERN, pii_scrub, url_domains

PIECES = [
    "plain", "words", "x.y", "a@b", "a@b.co", "no-reply@site.example.org",
    "user.name+tag@sub.domain.io", "10.0.0.1", "999.999.999.999",
    "1.2.3.4.5", "v1.2.3", "call 555-123-4567", "9555-123-45678",
    "555-12-34567", "https://example.com", "http://a.b.c/d?e=f&g=h",
    "https://x.io/path.", "ftp://nope.com", "https://", "http://host",
    "end@dot.com.", "(paren@wrap.org)", "semi;colon@sep.net",
    "https://trail.com/x,y", "ip:192.168.0.255!", "a@@b.com",
    "@leading.com", "1-800-555-0199", "12.34.56.78.90",
    # \x0B (vertical tab): Java \s includes it, RE2 \s does not — the
    # URL path class must terminate identically on it in both engines
    "https://vtab.example.com/path\x0bafter",
    "pre\x0bhttps://vt.io/x", "a@b.org\x0bc@d.net",
    # overlapping kinds: sequential counting must attribute each region
    # to exactly one kind on both engines
    "555-123-4567@example.org", "user@10.0.0.1.example.com",
    "mix 555-123-4567@x.io and 1.2.3.4",
]


def _texts(seed, n=60):
    rng = random.Random(seed)
    return [
        " ".join(rng.choices(PIECES, k=rng.randint(1, 12))) for _ in range(n)
    ]


@pytest.mark.parametrize("seed", [3, 17, 41])
def test_pii_counts_and_redaction_match_duckdb(spark, seed):
    texts = _texts(seed)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["n_email"], r["n_phone"], r["n_ip"], r["clean_text"])
        for r in pii_scrub(df).collect()
    }
    con = duckdb.connect()
    # sequential overlap semantics: each kind counts on the text after
    # the prior kinds' redaction (mirrors pii_scrub and the gate oracle)
    counts_l = []
    clean = "text"
    for k, p in PII_PATTERNS.items():
        counts_l.append(
            "CAST(len(regexp_extract_all(%s, '%s')) AS BIGINT) AS n_%s"
            % (clean, p, k)
        )
        clean = "regexp_replace(%s, '%s', '<PII>', 'g')" % (clean, p)
    counts = ", ".join(counts_l)
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(texts))
    )
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            f"SELECT doc_id, {counts}, {clean} AS c FROM t"
        ).fetchall()
    }
    assert got == want


@pytest.mark.parametrize("seed", [5, 23])
def test_url_extraction_matches_duckdb(spark, seed):
    texts = _texts(seed)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = sorted(
        (r["doc_id"], r["url"], r["domain"])
        for r in url_domains(df).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    want = sorted(
        con.execute(
            "SELECT doc_id, url, regexp_extract(url, '^https?://([^/]+)', 1)"
            " FROM (SELECT doc_id,"
            " unnest(regexp_extract_all(text, '%s')) AS url FROM t)"
            % URL_PATTERN
        ).fetchall()
    )
    assert got == want
