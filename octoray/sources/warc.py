"""WARC/1.0 source + sink — the container format real Common Crawl
ships (one gzip member per record, `WARC-Type: response`, payload
framed by Content-Length).  Extends the S-family interchange readers
(FASTA/TSV/xls/JSONL) to the crawl world so a user can point the
engine at actual WARC shards instead of pre-extracted parquet.

Ray shape mirrors sources/fasta.py: a directory of shard files ->
``read_binary_files`` -> flat parse per file inside ``map_batches``
(each shard parses independently; a directory of thousands of shards
streams with backpressure).  The writer is the synthesis path for
tests/benchmarks and doubles as a WARC sink.

No external libraries: the record grammar is ~40 lines (header block
terminated by CRLFCRLF, Content-Length payload, CRLFCRLF separator),
and per-record gzip members concatenate into a valid multi-member
stream that ``gzip.decompress`` unpacks in one call.
"""

from __future__ import annotations

import gzip
import os
from typing import Dict, List, Optional

import pyarrow as pa

_CRLF = "\r\n"
_GZIP_MAGIC = b"\x1f\x8b"

RECORD_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("payload", pa.binary()),
])


def _iso(ts_us: int) -> str:
    import datetime as dt

    t = dt.datetime.fromtimestamp(ts_us / 1e6, dt.timezone.utc)
    return t.strftime("%Y-%m-%dT%H:%M:%SZ")


def format_record(url: str, ts_us: int, payload: bytes,
                  *, rec_type: str = "response") -> bytes:
    head = _CRLF.join([
        "WARC/1.0",
        f"WARC-Type: {rec_type}",
        f"WARC-Target-URI: {url}",
        f"WARC-Date: {_iso(ts_us)}",
        f"Content-Length: {len(payload)}",
    ]) + _CRLF + _CRLF
    return head.encode("utf-8") + payload + b"\r\n\r\n"


def parse_warc(blob: bytes) -> List[Dict[str, object]]:
    """WARC bytes (plain or multi-member gzip) -> records.  Non-
    response records (warcinfo, request, metadata) are skipped, as
    consumers of crawl data do."""
    if blob[:2] == _GZIP_MAGIC:
        blob = gzip.decompress(blob)
    out: List[Dict[str, object]] = []
    i, n = 0, len(blob)
    while i < n:
        # skip inter-record padding
        while i < n and blob[i:i + 2] == b"\r\n":
            i += 2
        if i >= n:
            break
        end = blob.find(b"\r\n\r\n", i)
        if end < 0:
            break
        headers: Dict[str, str] = {}
        head = blob[i:end].decode("utf-8", errors="replace").split("\r\n")
        if not head or not head[0].startswith("WARC/"):
            raise ValueError(f"not a WARC record at byte {i}")
        for line in head[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers["content-length"])
        if end + 4 + length > n:
            # a truncated shard must fail loudly, not read back as a
            # plausible short payload with the tail records dropped
            raise ValueError(
                f"truncated WARC record at byte {i}: declared "
                f"Content-Length {length} runs past end of shard ({n} bytes)")
        payload = blob[end + 4:end + 4 + length]
        i = end + 4 + length
        if headers.get("warc-type") == "response":
            import datetime as dt

            ts = dt.datetime.strptime(
                headers["warc-date"], "%Y-%m-%dT%H:%M:%SZ"
            ).replace(tzinfo=dt.timezone.utc)
            out.append({
                "url": headers["warc-target-uri"],
                "warc_ts": int(ts.timestamp() * 1e6),
                "payload": payload,
            })
    return out


def records_table(recs: List[Dict[str, object]]) -> pa.Table:
    return pa.table({
        "url": pa.array([r["url"] for r in recs], pa.string()),
        "warc_ts": pa.array([r["warc_ts"] for r in recs],
                            pa.timestamp("us")),
        "payload": pa.array([r["payload"] for r in recs], pa.binary()),
    })


def write_warc_shard(path: str, urls, ts_us, payloads,
                     *, compress: bool = True) -> None:
    """One shard file; ``compress`` makes one gzip member per record
    (the Common Crawl convention — members stay independently
    seekable/splittable)."""
    with open(path, "wb") as fh:
        # leading warcinfo record, as real crawls carry
        info = format_record("urn:warcinfo", 0, b"software: octoray\r\n",
                             rec_type="warcinfo")
        fh.write(gzip.compress(info) if compress else info)
        for u, t, p in zip(urls, ts_us, payloads):
            rec = format_record(u, int(t), bytes(p))
            fh.write(gzip.compress(rec) if compress else rec)


def write_warc(pages_ds, out_dir: str, *, url_col: str = "url",
               ts_col: str = "warc_ts", payload_col: str = "html",
               compress: bool = True):
    """pages Dataset -> directory of WARC shards (one per input block,
    streaming — no driver materialization).  Returns ``out_dir``."""
    import shutil

    import pyarrow.compute as pc

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def dump(t: pa.Table) -> pa.Table:
        if t.num_rows:
            import hashlib

            # name from a digest of the FULL url+ts column content —
            # first-url+count collided for per-snapshot dumps of the
            # same crawl (same first url, same size) and silently
            # overwrote a shard
            h = hashlib.md5()
            for u in t.column(url_col).to_pylist():
                h.update(u.encode("utf-8"))
            import pyarrow.compute as pc  # noqa: F811

            for v in pc.cast(t.column(ts_col), pa.int64()).to_pylist():
                h.update(str(v).encode())
            name = f"shard-{h.hexdigest()[:16]}.warc"
            if compress:
                name += ".gz"
            ts = pc.cast(t.column(ts_col), pa.int64()).to_pylist()
            write_warc_shard(os.path.join(out_dir, name),
                             t.column(url_col).to_pylist(), ts,
                             t.column(payload_col).to_pylist(),
                             compress=compress)
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    # consume via a count so the write streams with backpressure
    pages_ds.map_batches(dump, batch_format="pyarrow").count()
    return out_dir


def read_warc(path_or_dir: str):
    """WARC shards -> streaming Dataset (url, warc_ts, payload)."""
    import ray.data as rd

    def parse(t: pa.Table) -> pa.Table:
        recs: List[Dict[str, object]] = []
        for blob in t.column("bytes").to_pylist():
            recs.extend(parse_warc(blob))
        return records_table(recs)

    return rd.read_binary_files(path_or_dir).map_batches(
        parse, batch_format="pyarrow"
    )
