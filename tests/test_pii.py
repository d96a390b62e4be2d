"""PII scrub (functions/pii.py): detection counts, replacement tokens,
non-PII text untouched."""
from imagery_utils_spark.functions.pii import pii_report


def test_counts_and_scrub(spark):
    rows = [
        (0, "write to alice.b+spam@mail.example.org today"),
        (1, "call +44-20-79 no wait +1-555-0100 works"),
        (2, "server at 192.168.0.1 and 10.0.0.255, version 1.2"),
        (3, "plain text, nothing sensitive here"),
        (4, "two mails a@b.io c.d@e.co and ip 8.8.8.8"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in pii_report(df).collect()}
    assert (got[0].n_emails, got[0].n_phones, got[0].n_ips) == (1, 0, 0)
    assert got[0].clean_text == "write to <EMAIL> today"
    assert (got[1].n_emails, got[1].n_phones, got[1].n_ips) == (0, 1, 0)
    assert "<PHONE> works" in got[1].clean_text
    assert (got[2].n_emails, got[2].n_phones, got[2].n_ips) == (0, 0, 2)
    assert got[2].clean_text == "server at <IP> and <IP>, version 1.2"
    assert got[3].clean_text == rows[3][1]
    assert (got[4].n_emails, got[4].n_ips) == (2, 1)
    assert got[4].clean_text == "two mails <EMAIL> <EMAIL> and ip <IP>"
