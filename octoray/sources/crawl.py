"""Deterministic multi-snapshot crawl synthesis.

Extends the single-snapshot pages table (sources/webtext.py, the
BASELINE.json input_hint shape) to the RE-CRAWL layout real Common
Crawl ships: the same url appears in several snapshots, its content
sometimes changed between them, with a per-fetch WARC timestamp.  This
is the input for the snapshot-maintenance operators
(stages/crawl.py): latest-per-url collapse, snapshot delta, per-domain
statistics.

Derivation is the same splitmix64-per-(seed, id) scheme as webtext —
identical output regardless of batch boundaries or parallelism:

  row id r (< n_pages * n_snapshots)  ->  page p = r // S, snapshot
  s = r % S.  The page is PRESENT in snapshot s iff
  mix(p, s, INCL) % 100 < coverage; its content VERSION is the number
  of change events at snapshots <= s (mix(p, s', CHG) % 100 <
  change_rate), so a page's text is byte-stable until a change event
  and jumps to the next deterministic revision after one.  Text for
  (page, version) is webtext.pages_batch(page, seed + version * K) —
  the full mention-bearing page generator, so downstream KG stages can
  run on crawl snapshots unchanged.

Urls are spread over a bounded domain set (``siteNN.example.org``) so
per-domain statistics have real key distribution.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from octoray.sources.webtext import _mix, pages_batch

# stream tags (arbitrary odd 64-bit constants)
_INCL = np.uint64(0x9D8F3A51C707AB13)
_CHG = np.uint64(0x5B7E92D14A33F68D)
_DOM = np.uint64(0x3C65A1F98E21D4B7)
_TS = np.uint64(0x71D2C48B5F09E3A5)

# 2025-01-01T00:00:00Z in epoch seconds; snapshots are a week apart
_EPOCH0 = 1_735_689_600
_SNAP_SECONDS = 7 * 86_400

_VERSION_SEED_STRIDE = 7_777


def _page_snap(row_ids: np.ndarray, n_snapshots: int):
    rid = row_ids.astype(np.int64)
    return rid // n_snapshots, rid % n_snapshots


def crawl_batch(
    row_ids: np.ndarray,
    *,
    seed: int = 42,
    n_snapshots: int = 4,
    n_domains: int = 40,
    coverage: int = 85,
    change_rate: int = 20,
) -> pa.Table:
    """row ids -> (url, warc_ts, snapshot, text) crawl rows.

    Absent (page, snapshot) fetches are dropped, so a batch returns
    <= len(row_ids) rows.  Everything is a pure function of
    (seed, page, snapshot)."""
    page, snap = _page_snap(np.asarray(row_ids), n_snapshots)
    pu = page.astype(np.uint64)
    su = snap.astype(np.uint64)

    keep = (_mix(pu ^ _INCL ^ (su * np.uint64(0x9E3779B9))) % np.uint64(100)) < coverage
    keep &= (page >= 0)
    page, snap, pu, su = page[keep], snap[keep], pu[keep], su[keep]

    # content version = number of change events at snapshots 1..s
    # (version 0 before any change).  n_snapshots is small, so the
    # cumulative count is a vectorized loop over snapshots, not rows.
    version = np.zeros(len(page), dtype=np.int64)
    for s in range(1, n_snapshots):
        chg = (
            _mix(pu ^ _CHG ^ np.uint64(s) * np.uint64(0x9E3779B9)) % np.uint64(100)
        ) < change_rate
        version += (chg & (snap >= s)).astype(np.int64)

    dom = (_mix(pu ^ _DOM) % np.uint64(n_domains)).astype(np.int64)
    urls = [
        f"https://site{d:02d}.example.org/p/{p:012d}"
        for d, p in zip(dom, page)
    ]

    # per-fetch timestamp: snapshot week + deterministic offset inside it
    off = (_mix(pu ^ _TS ^ su) % np.uint64(_SNAP_SECONDS)).astype(np.int64)
    ts_us = (_EPOCH0 + snap * _SNAP_SECONDS + off) * 1_000_000

    # text per (page, version): group by version (few values), one
    # pages_batch call per group, scatter back in place
    text = np.empty(len(page), dtype=object)
    for v in np.unique(version):
        m = version == v
        t = pages_batch(page[m], seed=seed + int(v) * _VERSION_SEED_STRIDE)
        text[m] = t.column("text").to_pylist()

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts_us, pa.timestamp("us")),
            "snapshot": pa.array(snap, pa.int32()),
            "text": pa.array(list(text), pa.string()),
        }
    )


def crawl_dataset(n_pages: int, *, seed: int = 42, n_snapshots: int = 4,
                  parallelism: int = -1, **kwargs):
    """The synthetic multi-snapshot crawl as a streaming Dataset."""
    import ray
    import ray.data as rd

    total = n_pages * n_snapshots
    if parallelism <= 0:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        parallelism = max(1, min(total, max(2 * cpus, total // 8192)))

    def f(b) -> pa.Table:
        return crawl_batch(
            b["id"], seed=seed, n_snapshots=n_snapshots, **kwargs
        )

    return rd.range(total, override_num_blocks=parallelism).map_batches(
        f, batch_format="numpy", batch_size=8192
    )
