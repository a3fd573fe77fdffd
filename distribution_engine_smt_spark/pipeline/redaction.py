"""PII redaction and URL/boilerplate signals over the ``documents`` table.

A real training-data pipeline scrubs personally identifiable information
(emails, phone numbers, IP addresses) and drops URL-dominated boilerplate
before anything reaches a tokenizer. Both operators here are pure Column
expressions (regexp_count / regexp_replace chains) — map-only, JVM-side,
shuffle-free at any scale: at 100 TB they run as a single scan with no
exchange, and the regex work vectorizes inside whole-stage codegen.

Dialect note: every pattern is written in the common subset of Java
``java.util.regex`` (Spark) and RE2 (DuckDB) — character classes,
bounded repetition, non-capturing groups, ``\\b`` word boundaries; no
lookarounds, no backreferences — so the DuckDB oracle runs the *same*
pattern text. The synthetic ``documents`` corpus contains no PII, so the
sf0.01 oracle proves the regex/replace plumbing is dialect-identical on
real data, while ``tests/test_redaction.py`` proves actual redaction
behavior on a PII-laden fixture through both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..driver_queries import _t, register

# Patterns shared verbatim by the Spark columns and the DuckDB oracle SQL.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
# international-ish phone: +CC or leading digit, then >=7 more digits allowing
# separators; anchored on digits at both ends so trailing punctuation stays.
PHONE_RE = r"\+?[0-9][0-9()\-. ]{6,}[0-9]"
URL_RE = r"https?://[^ \t\n]+"


def _count(col: Column, pattern: str) -> Column:
    return F.regexp_count(col, F.lit(pattern)).cast("long")


def redact_pii(col: Column) -> Column:
    """Replace emails -> <EMAIL>, then IPv4 -> <IP>, then phones -> <PHONE>.

    Order matters and is part of the contract: emails can embed dots and
    digits (never a valid IPv4 once the email is gone), and a raw IPv4
    string would otherwise be eaten by the greedy phone pattern.
    """
    out = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, IPV4_RE, "<IP>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")


def pii_columns(df: DataFrame, text: str = "text") -> DataFrame:
    """Attach PII counts + the redacted text to any document frame.

    Counts are *substitutions made*, not raw-text matches: each pattern is
    counted on the text AFTER the earlier replacements ran, because the
    patterns overlap (the phone pattern matches a raw IPv4 like
    ``172.16.4.20``; once it reads ``<IP>`` it no longer does).
    """
    c = F.col(text)
    after_email = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    return df.withColumns(
        {
            "n_emails": _count(c, EMAIL_RE),
            "n_ipv4": _count(after_email, IPV4_RE),
            "n_phones": _count(after_ip, PHONE_RE),
            "redacted": F.regexp_replace(after_ip, PHONE_RE, "<PHONE>"),
        }
    )


# DuckDB twin of pii_columns, over any relation aliased ``d`` with a ``text``
# column. regexp_replace needs the 'g' flag (DuckDB replaces first-match by
# default; Spark replaces all matches). Counts are staged exactly like the
# Spark columns: each pattern counted on the post-earlier-replacement text.
_AFTER_EMAIL = f"regexp_replace(d.text, '{EMAIL_RE}', '<EMAIL>', 'g')"
_AFTER_IP = f"regexp_replace({_AFTER_EMAIL}, '{IPV4_RE}', '<IP>', 'g')"
_PII_SQL_COLS = f"""
       len(regexp_extract_all(d.text, '{EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all({_AFTER_EMAIL}, '{IPV4_RE}')) AS n_ipv4,
       len(regexp_extract_all({_AFTER_IP}, '{PHONE_RE}')) AS n_phones,
       regexp_replace({_AFTER_IP}, '{PHONE_RE}', '<PHONE>', 'g') AS redacted
"""


@register(
    "pii_redact",
    f"""
    SELECT d.doc_id,
           {_PII_SQL_COLS}
    FROM documents d
    ORDER BY d.doc_id ASC
    """,
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return (
        pii_columns(t["documents"])
        .select("doc_id", "n_emails", "n_ipv4", "n_phones", "redacted")
        .orderBy(F.col("doc_id").asc())
    )


def url_columns(df: DataFrame, text: str = "text") -> DataFrame:
    """URL count + URL-character mass fraction, the standard boilerplate
    gate (link farms / nav pages are mostly URL characters)."""
    c = F.col(text)
    url_chars = (
        F.length(c) - F.length(F.regexp_replace(c, URL_RE, ""))
    ).cast("long")
    return df.withColumns(
        {
            "n_urls": _count(c, URL_RE),
            "url_chars": url_chars,
            "url_char_frac": F.round(
                url_chars.cast("double") / F.greatest(F.length(c), F.lit(1)).cast("double"),
                6,
            ),
        }
    )


@register(
    "url_density",
    f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{URL_RE}')) AS n_urls,
           length(text) - length(regexp_replace(text, '{URL_RE}', '', 'g'))
               AS url_chars,
           round((length(text)
                  - length(regexp_replace(text, '{URL_RE}', '', 'g')))::DOUBLE
                 / greatest(length(text), 1), 6) AS url_char_frac,
           (length(text) - length(regexp_replace(text, '{URL_RE}', '', 'g')))::DOUBLE
                 / greatest(length(text), 1) < 0.2 AS keep
    FROM documents
    ORDER BY doc_id ASC
    """,
)
def url_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    df = url_columns(t["documents"])
    return df.select(
        "doc_id",
        "n_urls",
        "url_chars",
        "url_char_frac",
        (
            F.col("url_chars").cast("double")
            / F.greatest(F.length("text"), F.lit(1)).cast("double")
            < F.lit(0.2)
        ).alias("keep"),
    ).orderBy(F.col("doc_id").asc())
