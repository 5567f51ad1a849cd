"""Redaction stage: rule order, masking interplay, kernel/SQL parity."""

import duckdb
import pyarrow as pa

from octoray.stages.redact import REDACTION_RULES, redact_batch


def _run(rows):
    tbl = pa.table(
        {"url": [u for u, _ in rows], "text": [t for _, t in rows]}
    )
    out = redact_batch(tbl)
    return [
        {c: out.column(c)[i].as_py() for c in out.column_names}
        for i in range(out.num_rows)
    ]


def test_contact_pii():
    (r,) = _run([("u", "mail bob@example.com or 555-123-4567 at 10.0.0.1")])
    assert r["text_clean"] == "mail [EMAIL] or [PHONE] at [IP]"
    assert (r["n_email"], r["n_phone"], r["n_ipv4"]) == (1, 1, 1)
    assert r["n_redactions"] == 3


def test_domain_identifiers_and_rule_order():
    # barcode inside a strain name; EPI must win over the generic
    # accession grammar; accession must not double-count the barcode
    (r,) = _run(
        [("u", "A/swine/Ontario/A08173696/2016 as ME930144 EPI_ISL_12345678")]
    )
    assert r["text_clean"] == "A/swine/Ontario/[BARCODE]/2016 as [ACCESSION] [EPI]"
    assert (r["n_epi"], r["n_barcode"], r["n_accession"]) == (1, 1, 1)


def test_no_matches_is_identity():
    (r,) = _run([("u", "plain sentence with no identifiers")])
    assert r["text_clean"] == "plain sentence with no identifiers"
    assert r["n_redactions"] == 0


def test_counts_taken_after_prior_rules():
    # an email whose local part looks like a barcode: the email rule
    # consumes it first, so the barcode rule sees nothing
    (r,) = _run([("u", "A01234567@lab.org")])
    assert r["n_email"] == 1 and r["n_barcode"] == 0
    assert r["text_clean"] == "[EMAIL]"


def test_sql_twin_parity():
    from octoray.oracles import sql_redact

    rows = [
        ("u1", "bob@example.com 555-123-4567 10.0.0.1 +1 (555) 123-4567"),
        ("u2", "A/swine/Iowa/A01234567/2014 H3N2 ME930144 EPI123456 collected"),
        ("u3", ""),
        ("u4", "edge A0123456 (7 digits short) vs A01234567 ok MU62000000x"),
    ]
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE pages AS SELECT * FROM (VALUES "
        + ",".join(f"('{u}', '{t}')" for u, t in rows)
        + ") AS t(url, text)"
    )
    sql_out = {
        r[0]: r[1:]
        for r in con.sql(sql_redact("(SELECT * FROM pages)")).fetchall()
    }
    names = [n for n, _, _ in REDACTION_RULES]
    for r in _run(rows):
        expect = tuple(r[f"n_{n}"] for n in names) + (
            r["text_clean"],
            r["n_redactions"],
        )
        assert sql_out[r["url"]] == expect, r["url"]
