"""WARC/1.0 container codec (sources/warc.py)."""

from __future__ import annotations

import gzip

import pyarrow as pa

from octoray.sources.warc import (
    format_record,
    parse_warc,
    read_warc,
    write_warc,
    write_warc_shard,
)


def test_record_roundtrip_plain_and_gzip():
    recs = [("https://a.org/1", 1_700_000_000_000_000, b"<html>one</html>"),
            ("https://a.org/2", 1_700_000_060_000_000, b"bytes \x00\xff ok")]
    blob = b"".join(format_record(u, t, p) for u, t, p in recs)
    # multi-member gzip (one member per record, the CC layout)
    gz = b"".join(gzip.compress(format_record(u, t, p)) for u, t, p in recs)
    for data in (blob, gz):
        out = parse_warc(data)
        assert [(r["url"], r["warc_ts"], bytes(r["payload"])) for r in out] == [
            (u, t, p) for u, t, p in recs
        ]


def test_non_response_records_skipped():
    info = format_record("urn:warcinfo", 0, b"software: x\r\n",
                         rec_type="warcinfo")
    resp = format_record("https://b.org", 1_000_000_000_000_000, b"hi")
    out = parse_warc(info + resp)
    assert len(out) == 1 and out[0]["url"] == "https://b.org"


def test_payload_with_crlf_sequences():
    """Content-Length framing must win over separator lookalikes inside
    the payload."""
    tricky = b"a\r\n\r\nWARC/1.0\r\nfake: yes\r\n\r\nb"
    rec = format_record("https://c.org", 0, tricky)
    out = parse_warc(rec)
    assert bytes(out[0]["payload"]) == tricky


def test_dataset_roundtrip_byte_identical(ray_session, tmp_path):
    from octoray.sources.webtext import pages_dataset

    d = str(tmp_path / "warc")
    write_warc(pages_dataset(200, seed=7), d)
    back = {r["url"]: bytes(r["payload"]) for r in read_warc(d).take_all()}
    src = {
        r["url"]: bytes(r["html"])
        for b in pages_dataset(200, seed=7).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    assert back == src


def test_uncompressed_shard(ray_session, tmp_path):
    import ray.data as rd

    p = str(tmp_path / "plain.warc")
    write_warc_shard(p, ["https://x.org/1"], [0], [b"payload"],
                     compress=False)
    out = parse_warc(open(p, "rb").read())
    assert len(out) == 1 and bytes(out[0]["payload"]) == b"payload"


def test_truncated_shard_raises():
    """A shard cut mid-payload must raise, not silently return a short
    payload and drop the records after the cut."""
    import pytest

    rec = format_record("https://t.org", 0, b"0123456789")
    with pytest.raises(ValueError, match="truncated WARC record"):
        parse_warc(rec[:-6])
