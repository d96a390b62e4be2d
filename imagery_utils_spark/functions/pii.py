"""PII detection + scrubbing for webtext pipelines: emails, phone
numbers, IPv4 addresses — the standard pre-training redaction pass
(the public BigScience/ROOTS and Dolma pipelines run exactly this shape
of regex scrub before tokenization).

All JVM-side (``regexp_count`` / ``regexp_replace`` inside whole-stage
codegen — no Python in the scan). The patterns deliberately stay within
the regex subset whose semantics are identical between Java regex and
RE2 (character classes, bounded quantifiers, ASCII ``\\b``) so the same
pattern strings drive both the engine and the SQL oracle.

Scrub order is pinned (emails → phones → IPv4) because replacement
tokens contain no digits/at-signs, so later passes can never match
inside an earlier token.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["EMAIL_RE", "PHONE_RE", "IP_RE", "scrub_pii", "pii_report"]

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+\d{1,3}-\d{3}-\d{4}"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IP_TOKEN = "<IP>"


def scrub_pii(text: Column) -> Column:
    """Replace every email/phone/IPv4 occurrence with its typed token
    (pinned order — see module docstring)."""
    out = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)
    return F.regexp_replace(out, IP_RE, IP_TOKEN)


def pii_report(df: DataFrame, text: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-document counts (on the ORIGINAL text) + scrubbed text.
    One projection, zero shuffles."""
    t = F.col(text)
    return df.select(
        id_col,
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).alias("n_phones"),
        F.regexp_count(t, F.lit(IP_RE)).alias("n_ips"),
        scrub_pii(t).alias("clean_text"),
    )
