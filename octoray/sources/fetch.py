"""Entrez-shaped HTTP fetch stage — the network half of the GenBank
pull (SURVEY.md §2.9 X4 / S4 / S5), implemented for real and tested
against a local synthetic server.

Reference semantics ported (behavior, not code):

  - batch efetch with retry: sub-batches of ``batch_size`` ids, up to
    ``max_attempts`` tries each, a fixed ``backoff_s`` sleep between
    tries, loud failure after exhaustion
    (/root/reference/octofludb/entrez.py:126-143 — 1000-id batches,
    10 attempts, 15 s sleep).
  - paged month search with a truncation warning when the server's
    count exceeds retmax, and a politeness sleep after every search
    call (/root/reference/octofludb/entrez.py:35-76).

The real NCBI endpoint is unreachable from this sandbox, so
``base_url`` is a constructor parameter and the wire format is the
JSON contract the test server speaks (`efetch` -> {"records": [...]},
`esearch` -> {"esearchresult": {...}} — the same esearch envelope
NCBI's retmode=json returns).  A production deployment points
``base_url`` at eutils and swaps ``parse_response`` for an XML
Entrez.read adapter; every retry/backoff/truncation path below is the
one the tests drive.

Ray shape: ``EntrezFetcher`` is a callable CLASS for
``map_batches(EntrezFetcher, fn_constructor_kwargs=..., concurrency=N)``
— the HTTP opener and policy are actor state built once in
``__init__``; ``__call__`` fetches one Arrow batch of accession ids
and emits (gb_id, record) rows.  Fetch tasks are I/O-bound: size
``concurrency`` above the CPU count and keep ``num_cpus`` fractional
when the pool runs beside compute stages.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request
from typing import Callable, List, Optional, Sequence

import pyarrow as pa


class FetchError(RuntimeError):
    """A sub-batch exhausted its retry budget — the task fails loudly
    (Ray task retry / the manifest resume layer takes over), never
    silently drops ids."""


def _default_parse(payload: bytes) -> List[str]:
    """JSON wire contract: {"records": [<record-string>, ...]}."""
    return list(json.loads(payload.decode("utf-8"))["records"])


class EntrezFetcher:
    """Actor-pool fetch stage: Arrow batch of ``gb_id`` -> (gb_id,
    record) rows, with the reference's retry envelope.

    ``sleep`` is injectable so tests drive the 15 s backoff path
    without wall-clock cost; production leaves the default."""

    def __init__(self, base_url: str, *, batch_size: int = 1000,
                 max_attempts: int = 10, backoff_s: float = 15.0,
                 timeout_s: float = 60.0,
                 parse_response: Callable[[bytes], List[str]] = _default_parse,
                 sleep: Callable[[float], None] = time.sleep):
        self.base_url = base_url.rstrip("/")
        self.batch_size = int(batch_size)
        self.max_attempts = int(max_attempts)
        self.backoff_s = float(backoff_s)
        self.timeout_s = float(timeout_s)
        self.parse_response = parse_response
        self.sleep = sleep
        # opener built once per actor (connection/header state)
        self.opener = urllib.request.build_opener()

    def _get(self, path: str, params: dict) -> bytes:
        url = f"{self.base_url}/{path}?{urllib.parse.urlencode(params)}"
        with self.opener.open(url, timeout=self.timeout_s) as resp:
            return resp.read()

    def _post(self, path: str, params: dict) -> bytes:
        """Form-POST — efetch id lists go in the body, never the URL:
        a 1000-accession sub-batch is ~11 KB, past every common GET
        length cap (NCBI itself requires POST above ~200 ids)."""
        url = f"{self.base_url}/{path}"
        body = urllib.parse.urlencode(params).encode("ascii")
        req = urllib.request.Request(
            url, data=body,
            headers={"Content-Type": "application/x-www-form-urlencoded"})
        with self.opener.open(req, timeout=self.timeout_s) as resp:
            return resp.read()

    def fetch_ids(self, ids: Sequence[str]) -> List[str]:
        """All records for ``ids``, in id order — sub-batched with the
        reference's 10x / backoff retry per sub-batch
        (entrez.py:131-143)."""
        out: List[str] = []
        for start in range(0, len(ids), self.batch_size):
            chunk = list(ids[start:start + self.batch_size])
            attempt = 0
            while True:
                attempt += 1
                try:
                    payload = self._post("efetch.fcgi", {
                        "db": "nucleotide", "id": ",".join(chunk),
                        "retmode": "json"})
                    out.extend(self.parse_response(payload))
                    break
                except Exception as err:  # noqa: BLE001 — retry envelope
                    if attempt >= self.max_attempts:
                        raise FetchError(
                            f"efetch failed after {attempt} attempts for "
                            f"{len(chunk)} ids starting {chunk[0]!r}: {err}"
                        ) from err
                    self.sleep(self.backoff_s)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = [str(v) for v in batch.column("gb_id").to_pylist()]
        recs = self.fetch_ids(ids)
        return pa.table({
            "gb_id": pa.array(ids, pa.string()),
            "record": pa.array(recs, pa.string()),
        })


def fetch_records(ids_ds, base_url: str, *, concurrency=2,
                  rows_per_call: int = 1000, **fetcher_kwargs):
    """ids Dataset (column ``gb_id``) -> (gb_id, record) Dataset via an
    ``EntrezFetcher`` actor pool.  ``rows_per_call`` bounds the Arrow
    batch handed to each actor call; the fetcher re-chunks to its own
    ``batch_size`` sub-batches internally, so the retry granularity is
    independent of Ray's batching."""
    return ids_ds.map_batches(
        EntrezFetcher,
        fn_constructor_args=(base_url,),
        fn_constructor_kwargs=fetcher_kwargs,
        batch_size=rows_per_call,
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def search_dates(base_url: str, mindate: str, maxdate: str, *,
                 retmax: int = 100_000,
                 query: str = '"Influenza A Virus"[Organism]',
                 timeout_s: float = 60.0,
                 sleep: Callable[[float], None] = time.sleep,
                 warn: Optional[Callable[[str], None]] = None) -> dict:
    """One esearch page for a date window (entrez.py:35-76): returns
    {"ids", "count", "retmax", "truncated"}; warns (via ``warn`` or
    ``warnings.warn``) when the server truncated the id list at
    retmax, and applies the reference's 1 s politeness sleep after the
    call."""
    import warnings

    params = {
        "db": "nuccore", "term": query, "retmode": "json",
        "retmax": str(int(retmax)), "datetype": "pdat",
        "mindate": mindate, "maxdate": maxdate, "idtype": "acc",
    }
    url = f"{base_url.rstrip('/')}/esearch.fcgi?{urllib.parse.urlencode(params)}"
    with urllib.request.urlopen(url, timeout=timeout_s) as resp:
        result = json.loads(resp.read().decode("utf-8"))["esearchresult"]
    count = int(result["count"])
    got_retmax = int(result["retmax"])
    truncated = got_retmax < count
    if truncated:
        msg = f"results truncated at {got_retmax} of {count} ids"
        (warn or (lambda m: warnings.warn(m, stacklevel=2)))(msg)
    sleep(1)  # reference politeness pause (entrez.py:73)
    return {"ids": list(result["idlist"]), "count": count,
            "retmax": got_retmax, "truncated": truncated}
