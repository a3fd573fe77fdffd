"""PII redaction / URL density: behavior on a PII-laden fixture (the
synthetic documents corpus contains no PII, so the sf0.01 oracle only
proves dialect parity on clean text) + the same fixture pushed through
DuckDB with the identical pattern strings to prove the Java-regex/RE2
common subset really is common."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from distribution_engine_smt_spark.pipeline import redaction as R

DOCS = [
    (1, "contact me at alice.smith+spam@example.co.uk or bob@test.io today"),
    (2, "server at 192.168.0.1 and 10.0.0.255 rebooted"),
    (3, "call +1 (555) 123-4567 or 555-867-5309 now"),
    (4, "mixed: eve@corp.com from 172.16.4.20 dialed 020 7946 0958."),
    (5, "clean text with no personal identifiers at all"),
    (6, "see https://example.com/a?b=c and http://foo.bar/baz for details"),
]


@pytest.fixture(scope="module")
def fixture_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_redact_emails_ips_phones(spark, fixture_df):
    rows = {
        r["doc_id"]: r
        for r in R.pii_columns(fixture_df).orderBy("doc_id").collect()
    }
    assert rows[1]["n_emails"] == 2 and rows[1]["redacted"] == (
        "contact me at <EMAIL> or <EMAIL> today"
    )
    assert rows[2]["n_ipv4"] == 2 and rows[2]["redacted"] == (
        "server at <IP> and <IP> rebooted"
    )
    assert rows[3]["n_phones"] == 2 and rows[3]["redacted"] == (
        "call <PHONE> or <PHONE> now"
    )
    # mixed row: one of each, replaced in email -> ip -> phone order
    assert (
        rows[4]["n_emails"],
        rows[4]["n_ipv4"],
        rows[4]["n_phones"],
    ) == (1, 1, 1)
    assert rows[4]["redacted"] == "mixed: <EMAIL> from <IP> dialed <PHONE>."
    assert rows[5]["redacted"] == DOCS[4][1]
    assert (rows[5]["n_emails"], rows[5]["n_ipv4"], rows[5]["n_phones"]) == (0, 0, 0)


def test_url_density_fixture(spark, fixture_df):
    rows = {r["doc_id"]: r for r in R.url_columns(fixture_df).collect()}
    assert rows[6]["n_urls"] == 2
    # chars removed by stripping both URLs
    expect = len("https://example.com/a?b=c") + len("http://foo.bar/baz")
    assert rows[6]["url_chars"] == expect
    assert rows[5]["n_urls"] == 0 and rows[5]["url_chars"] == 0


def test_dialect_parity_on_pii_fixture(spark, fixture_df):
    """Run the exact pattern strings through DuckDB's RE2 on the same rows:
    counts and redacted text must agree byte-for-byte with Spark's Java
    regex. This is the guarantee the sf0.01 oracle can't give (no PII in
    the synthetic corpus)."""
    sp = (
        R.pii_columns(fixture_df)
        .select("doc_id", "n_emails", "n_ipv4", "n_phones", "redacted")
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("d", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    du = con.execute(
        f"SELECT d.doc_id, {R._PII_SQL_COLS} FROM d ORDER BY d.doc_id"
    ).df()
    con.close()
    for col in ["n_emails", "n_ipv4", "n_phones"]:
        assert list(sp[col]) == [int(x) for x in du[col]], col
    assert list(sp["redacted"]) == list(du["redacted"])
