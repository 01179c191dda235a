"""PII redaction (functions/pii.py): placeholder semantics, counting
rules, and the email-before-ip ordering contract."""

from dachshund_spark.functions.pii import pii_stats, redacted_text


def test_pii_redaction_semantics(spark):
    rows = [
        (0, "mail me at a.user+tag@sub.mail.example thanks"),
        (1, "call 555-123-4567 or 555-987-6543"),
        (2, "hosts 10.0.0.1 and 192.168.255.3"),
        # email pattern requires an alphabetic TLD, so an @ followed by a
        # bare IPv4 is NOT an email — the IP rule catches the address
        (3, "root@10.0.0.1 is an email-shaped login"),
        (4, "no pii here"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_emails"], r["n_phones"], r["n_ipv4"])
        for r in pii_stats(df).collect()
    }
    assert got[0] == (1, 0, 0)
    assert got[1] == (0, 2, 0)
    assert got[2] == (0, 0, 2)
    assert got[3] == (0, 0, 1)
    assert got[4] == (0, 0, 0)
    assert got[5] == (0, 0, 0)

    red = {
        r["doc_id"]: r["red"]
        for r in df.select("doc_id", redacted_text("text").alias("red"))
        .collect()
    }
    assert red[0] == "mail me at [EMAIL] thanks"
    assert red[1] == "call [PHONE] or [PHONE]"
    assert red[2] == "hosts [IP] and [IP]"
    assert red[3] == "root@[IP] is an email-shaped login"
    assert red[4] == "no pii here"
