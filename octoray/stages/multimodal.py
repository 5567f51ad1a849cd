"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Training-data pipelines at 100 TB carry media as ``binary`` columns
with sidecar metadata; the Ray shape is actor-pool ``map_batches``
stages with SMALL batch sizes (a batch x concurrency of decoded frames
must fit the worker heap — see ``MEDIA_BATCH_SIZE``).

What is real vs stubbed in this sandbox (no PIL/ffmpeg/torchaudio):
  REAL   raw-array operations — RGB nearest-neighbor resize, PCM
         RMS/zero-crossing features, fixed-stride video frame
         sampling, hash-based deterministic embeddings.  All numpy
         over the raw payload bytes; these run identically with or
         without codec libraries.
  STUB   compressed-format decode (JPEG/PNG/OGG...): ``ImageDecoder``
         tries ``PIL`` in ``__init__`` (once per actor); absent that,
         payloads carrying the synthetic RAW header decode
         deterministically and anything else raises
         ``NotImplementedError`` — the actor signature, schema and
         batch plumbing are the production shape.

Payload format for synthetic media (sources below): a 16-byte header
``OCTO`` + kind byte + dims, then raw samples — so "decode" is a
real parse, deterministic across the cluster.
"""

from __future__ import annotations

import hashlib
import struct
from typing import List, Optional

import numpy as np
import pyarrow as pa

from octoray.sources.webtext import _streams

MEDIA_BATCH_SIZE = 64  # payloads are MBs: keep batch x pool in heap

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("meta_w", pa.int32()),  # image/video width (0 for audio)
        ("meta_h", pa.int32()),
        ("meta_n", pa.int32()),  # frames (video) / samples (audio) / 1
    ]
)

_MAGIC = b"OCTO"


# ----------------------------------------------------------------------
# deterministic synthetic media (the input-table synthesizer)
# ----------------------------------------------------------------------
_HDR = "<BxHHHxxxx"  # kind, pad, w, h, n, pad -> 12 bytes (16 with magic)


def _pack(kind: int, w: int, h: int, n: int, body: np.ndarray) -> bytes:
    return _MAGIC + struct.pack(_HDR, kind, w, h, n) + body.tobytes()


def synth_media_batch(ids: np.ndarray, seed: int = 42) -> pa.Table:
    """One media row per id: cycling image (raw RGB), audio (PCM16),
    video (stacked RGB frames).  Pixel/sample values derive from
    splitmix64 — byte-identical regardless of batching."""
    ids = np.asarray(ids, dtype=np.int64)
    kinds, payloads, mimes, ws, hs, ns = [], [], [], [], [], []
    for mid in ids.tolist():
        r = _streams(np.array([mid], dtype=np.uint64), seed ^ 0x3D1A, 4)[0]
        kind = mid % 3
        if kind == 0:  # image
            w, h = 32 + int(r[0] % 32), 32 + int(r[1] % 32)
            body = (
                _streams(np.arange(w * h * 3, dtype=np.uint64) + r[2], seed, 1)[:, 0]
                & np.uint64(0xFF)
            ).astype(np.uint8)
            payloads.append(_pack(0, w, h, 1, body))
            kinds.append("image"); mimes.append("image/x-octo-raw")
            ws.append(w); hs.append(h); ns.append(1)
        elif kind == 1:  # audio: 1600 PCM16 samples
            n = 1600
            body = (
                (_streams(np.arange(n, dtype=np.uint64) + r[2], seed, 1)[:, 0]
                 & np.uint64(0xFFFF)).astype(np.int64) - 32768
            ).astype(np.int16)
            payloads.append(_pack(1, 0, 0, n, body))
            kinds.append("audio"); mimes.append("audio/x-octo-pcm16")
            ws.append(0); hs.append(0); ns.append(n)
        else:  # video: f frames of 16x16 RGB
            f = 4 + int(r[0] % 5)
            w = h = 16
            body = (
                _streams(np.arange(f * w * h * 3, dtype=np.uint64) + r[2], seed, 1)[:, 0]
                & np.uint64(0xFF)
            ).astype(np.uint8)
            payloads.append(_pack(2, w, h, f, body))
            kinds.append("video"); mimes.append("video/x-octo-rawframes")
            ws.append(w); hs.append(h); ns.append(f)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
            "meta_w": pa.array(ws, pa.int32()),
            "meta_h": pa.array(hs, pa.int32()),
            "meta_n": pa.array(ns, pa.int32()),
        }
    )


def media_dataset(n: int, seed: int = 42, parallelism: int = -1):
    import ray
    import ray.data as rd

    if parallelism <= 0:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        parallelism = max(1, min(n, max(2 * cpus, n // 2048)))
    return rd.range(n, override_num_blocks=parallelism).map_batches(
        lambda b: synth_media_batch(b["id"], seed=seed),
        batch_format="numpy",
        batch_size=MEDIA_BATCH_SIZE,
    )


def _parse_payload(data: bytes):
    """(kind, w, h, n, body) from the raw container; None if foreign."""
    if data[:4] != _MAGIC:
        return None
    kind, w, h, n = struct.unpack(_HDR, data[4:16])
    return kind, w, h, n, data[16:]


# ----------------------------------------------------------------------
# decode (actor pool; codec libs optional -> stub)
# ----------------------------------------------------------------------
class ImageDecoder:
    """payload -> (media_id, width, height, mean_r/g/b).  PIL loads
    once per actor when present; raw-container payloads decode without
    it.  Foreign formats without PIL raise NotImplementedError — the
    stub boundary called out in the module docstring."""

    def __init__(self):
        try:  # pragma: no cover - PIL absent in this container
            from PIL import Image  # type: ignore

            self._pil = Image
        except ImportError:
            self._pil = None

    def decode(self, data: bytes) -> np.ndarray:
        parsed = _parse_payload(data)
        if parsed is not None:
            kind, w, h, n, body = parsed
            if kind != 0:
                raise ValueError("not an image payload")
            return np.frombuffer(body, np.uint8).reshape(h, w, 3)
        if self._pil is None:
            raise NotImplementedError(
                "compressed image decode requires PIL (not in this container)"
            )
        import io  # pragma: no cover

        return np.asarray(self._pil.open(io.BytesIO(data)).convert("RGB"))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, w_, h_, means = [], [], [], []
        for mid, data in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            img = self.decode(data)
            ids.append(mid)
            h_.append(img.shape[0]); w_.append(img.shape[1])
            means.append(img.reshape(-1, 3).mean(axis=0))
        m = np.stack(means) if means else np.zeros((0, 3))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "width": pa.array(w_, pa.int32()),
                "height": pa.array(h_, pa.int32()),
                "mean_r": pa.array(m[:, 0], pa.float64()),
                "mean_g": pa.array(m[:, 1], pa.float64()),
                "mean_b": pa.array(m[:, 2], pa.float64()),
            }
        )


def image_features(media, *, concurrency=(1, 4)):
    """Images only -> per-image stats via the decoder actor pool."""
    import pyarrow.compute as pc

    imgs = media.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), pa.scalar("image"))),
        batch_format="pyarrow",
    )
    return imgs.map_batches(
        ImageDecoder, batch_format="pyarrow", batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
    )


class ImageResizer:
    """Nearest-neighbor resize to (out_w, out_h) — REAL numpy striding
    on raw arrays; re-packs into the raw container so stages chain."""

    def __init__(self, out_w: int = 16, out_h: int = 16):
        self.out_w = out_w
        self.out_h = out_h
        self._dec = ImageDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, payloads = [], []
        for mid, data in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            img = self._dec.decode(data)
            h, w = img.shape[:2]
            yi = (np.arange(self.out_h) * h // self.out_h)
            xi = (np.arange(self.out_w) * w // self.out_w)
            small = img[yi][:, xi]
            ids.append(mid)
            payloads.append(_pack(0, self.out_w, self.out_h, 1, small.astype(np.uint8)))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array([self.out_w] * len(ids), pa.int32()),
                "height": pa.array([self.out_h] * len(ids), pa.int32()),
            }
        )


def resize_images(media, *, out_w: int = 16, out_h: int = 16, concurrency=(1, 4)):
    import pyarrow.compute as pc

    imgs = media.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), pa.scalar("image"))),
        batch_format="pyarrow",
    )
    return imgs.map_batches(
        ImageResizer, fn_constructor_kwargs=dict(out_w=out_w, out_h=out_h),
        batch_format="pyarrow", batch_size=MEDIA_BATCH_SIZE, concurrency=concurrency,
    )


def image_pixels(media):
    """Images -> (media_id, width, height, pixels list<int32>): the
    decoded raw RGB array flattened row-major — the oracle hand-off
    artifact so DuckDB can re-derive the feature math from pixels."""
    import pyarrow.compute as pc

    dec = ImageDecoder()

    def f(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.equal(t.column("kind"), pa.scalar("image")))
        ids, w_, h_, flat = [], [], [], []
        for mid, data in zip(
            sel.column("media_id").to_pylist(), sel.column("payload").to_pylist()
        ):
            img = dec.decode(data)
            ids.append(mid)
            h_.append(img.shape[0]); w_.append(img.shape[1])
            flat.append(img.reshape(-1).astype(np.int32))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "width": pa.array(w_, pa.int32()),
                "height": pa.array(h_, pa.int32()),
                "pixels": pa.array([x.tolist() for x in flat], pa.list_(pa.int32())),
            }
        )

    return media.map_batches(f, batch_format="pyarrow", batch_size=MEDIA_BATCH_SIZE)


def image_ahash(media, *, grid: int = 8, concurrency=(1, 4)):
    """Sampled average-hash (aHash) perceptual fingerprint per image:
    bit(i, j) = 1 iff the gray value at the fixed grid position
    (h*i//grid, w*j//grid) exceeds the image's mean gray.  Exact-match
    aHash grouping is the cheap first tier of image dedup (identical
    and near-identical re-encodes collide); Hamming-near pairs can
    ride the existing SimHash pigeonhole machinery.

    All-integer definition so the DuckDB twin is exact: with S = sum
    of all channel values and wh = w*h, bit = (r+g+b at the sample)
    * wh > S (both sides integer — no float mean).  The hash travels
    as a grid^2-char '0'/'1' string (uint64 would overflow BIGINT's
    sign bit in SQL).  Decode runs in the actor-pool decoder
    (compressed codecs gated per actor, like every image stage)."""
    import pyarrow.compute as pc

    class AHasher:
        def __init__(self):
            self._dec = ImageDecoder()
            self._grid = grid

        def __call__(self, batch: pa.Table) -> pa.Table:
            g = self._grid
            ids, hashes = [], []
            for mid, data in zip(
                batch.column("media_id").to_pylist(),
                batch.column("payload").to_pylist(),
            ):
                img = self._dec.decode(data).astype(np.int64)
                h, w = img.shape[:2]
                s = int(img.sum())
                yi = np.arange(g) * h // g
                xi = np.arange(g) * w // g
                gray3 = img[yi][:, xi].sum(axis=2)  # (g, g) of r+g+b
                bits = (gray3 * (w * h) > s).astype(np.uint8).reshape(-1)
                ids.append(mid)
                hashes.append("".join("1" if b else "0" for b in bits))
            return pa.table({
                "media_id": pa.array(ids, pa.int64()),
                "ahash": pa.array(hashes, pa.string()),
            })

    imgs = media.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), pa.scalar("image"))),
        batch_format="pyarrow",
    )
    return imgs.map_batches(AHasher, batch_format="pyarrow",
                            batch_size=MEDIA_BATCH_SIZE,
                            concurrency=concurrency)


def image_dedup(media, *, grid: int = 8, concurrency=(1, 4)):
    """Exact-tier perceptual image dedup: group images by aHash and
    keep the lowest media_id as the group representative (identical
    and byte-identical-after-re-encode images collide on the hash;
    the Hamming-near tier composes via the SimHash pigeonhole index).

    The hash table is one slim row per image (media_id + grid^2-char
    hash), so the groupby exchange moves O(images) tiny rows, never
    pixels; Min/Count aggregate map-side partials before the shuffle.
    Returns (ahash, media_id, n_dups) — representative id + group
    size per distinct perceptual hash."""
    from ray.data.aggregate import Count, Min

    hashes = image_ahash(media, grid=grid, concurrency=concurrency)
    return hashes.groupby("ahash").aggregate(
        Min("media_id", alias_name="media_id"),
        Count(alias_name="n_dups"))


def sql_image_dedup(src: str, *, grid: int = 8) -> str:
    """DuckDB twin of :func:`image_dedup` over the dumped
    ``media_pixels`` artifact: re-derives every aHash from raw pixels
    (certifying hash + grouping + keep-first in one compare)."""
    return f"""
        WITH h AS ({sql_image_ahash(src, grid=grid)})
        SELECT ahash, min(media_id) AS media_id,
               CAST(count(*) AS BIGINT) AS n_dups
        FROM h GROUP BY ahash
    """


def sql_image_ahash(src: str, *, grid: int = 8) -> str:
    """DuckDB twin of :func:`image_ahash` over the dumped
    ``media_pixels`` artifact (media_id, width, height, pixels)."""
    terms = []
    for i in range(grid):
        for j in range(grid):
            idx = (f"3 * (((height * {i}) // {grid}) * width"
                   f" + ((width * {j}) // {grid})) + 1")
            g3 = (f"(pixels[{idx}] + pixels[{idx} + 1]"
                  f" + pixels[{idx} + 2])")
            terms.append(f"CASE WHEN {g3} * (width * height) > s "
                         f"THEN '1' ELSE '0' END")
    concat = " || ".join(terms)
    return f"""
        WITH p AS (SELECT media_id, width, height, pixels,
                          list_aggregate(pixels, 'sum') AS s
                   FROM {src})
        SELECT media_id, {concat} AS ahash FROM p
    """


def audio_fingerprint(media, *, bands: int = 8):
    """Banded-energy audio fingerprint — the PCM analog of the aHash
    exact-match image tier: bit b = 1 iff band b's summed |sample|
    energy exceeds the track mean (integer cross-multiplied compare,
    no float mean, so the DuckDB twin is exact).  Band boundaries are
    the fixed integer grid (b*n//bands), robust to container re-muxes
    that keep PCM bytes; Hamming-near pairs ride the SimHash
    pigeonhole machinery, and keep-first dedup composes exactly like
    image_dedup.  Hash travels as a ``bands``-char '0'/'1' string."""
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.equal(t.column("kind"), pa.scalar("audio")))
        ids, hashes = [], []
        for mid, data in zip(
            sel.column("media_id").to_pylist(),
            sel.column("payload").to_pylist(),
        ):
            parsed = _parse_payload(data)
            if parsed is None or parsed[0] != 1:
                continue
            x = np.abs(np.frombuffer(parsed[4], np.int16).astype(np.int64))
            n = len(x)
            cuts = (np.arange(bands + 1) * n) // bands
            e = np.add.reduceat(x, cuts[:-1]) if n else np.zeros(bands,
                                                                 np.int64)
            # a cut may repeat when n < bands: reduceat then sums a
            # wrapped range — zero those empty bands explicitly
            e[cuts[:-1] == cuts[1:]] = 0
            total = int(x.sum())
            bits = (e * bands > total)
            ids.append(mid)
            hashes.append("".join("1" if b else "0" for b in bits))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "afp": pa.array(hashes, pa.string()),
        })

    return media.map_batches(f, batch_format="pyarrow",
                             batch_size=MEDIA_BATCH_SIZE)


def sql_audio_fingerprint(src: str, *, bands: int = 8) -> str:
    """DuckDB twin of :func:`audio_fingerprint` over the dumped
    ``media_pcm`` artifact (media_id, pcm): identical integer band
    grid, abs-sums and cross-multiplied threshold."""
    terms = []
    for b in range(bands):
        lo = f"(len(pcm) * {b}) // {bands} + 1"
        hi = f"(len(pcm) * {b + 1}) // {bands}"
        e = (f"coalesce(list_aggregate(list_transform("
             f"pcm[{lo}:{hi}], x -> abs(x)), 'sum'), 0)")
        terms.append(f"CASE WHEN {e} * {bands} > tot "
                     f"THEN '1' ELSE '0' END")
    concat = " || ".join(terms)
    return f"""
        WITH p AS (SELECT media_id, pcm,
                          list_aggregate(list_transform(pcm,
                              x -> abs(x)), 'sum') AS tot
                   FROM {src})
        SELECT media_id, {concat} AS afp FROM p
    """


def audio_pcm(media):
    """Audio -> (media_id, pcm list<int32>): the decoded PCM samples
    (oracle hand-off artifact for the feature-math twin)."""
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.equal(t.column("kind"), pa.scalar("audio")))
        ids, pcm = [], []
        for mid, data in zip(
            sel.column("media_id").to_pylist(), sel.column("payload").to_pylist()
        ):
            parsed = _parse_payload(data)
            if parsed is None or parsed[0] != 1:
                continue
            ids.append(mid)
            pcm.append(np.frombuffer(parsed[4], np.int16).astype(np.int32).tolist())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "pcm": pa.array(pcm, pa.list_(pa.int32())),
            }
        )

    return media.map_batches(f, batch_format="pyarrow", batch_size=MEDIA_BATCH_SIZE)


# ----------------------------------------------------------------------
# audio features (REAL: PCM math needs no codec)
# ----------------------------------------------------------------------
def audio_features(media):
    """PCM16 payloads -> (media_id, n_samples, rms, zero_crossings).
    Stateless vectorized stage."""
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.equal(t.column("kind"), pa.scalar("audio")))
        ids, ns, rms, zc = [], [], [], []
        for mid, data in zip(
            sel.column("media_id").to_pylist(), sel.column("payload").to_pylist()
        ):
            parsed = _parse_payload(data)
            if parsed is None or parsed[0] != 1:
                continue
            pcm = np.frombuffer(parsed[4], np.int16).astype(np.float64)
            ids.append(mid)
            ns.append(len(pcm))
            rms.append(float(np.sqrt((pcm ** 2).mean())) if len(pcm) else 0.0)
            zc.append(int((np.signbit(pcm[1:]) != np.signbit(pcm[:-1])).sum()))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "n_samples": pa.array(ns, pa.int64()),
                "rms": pa.array(rms, pa.float64()),
                "zero_crossings": pa.array(zc, pa.int64()),
            }
        )

    return media.map_batches(f, batch_format="pyarrow", batch_size=MEDIA_BATCH_SIZE)


# ----------------------------------------------------------------------
# video frame sampling (REAL: fixed-stride slicing on raw frames)
# ----------------------------------------------------------------------
def sample_frames(media, *, every: int = 2):
    """video payload -> one row PER SAMPLED FRAME (1 -> N fan-out):
    (media_id, frame_idx, payload) where payload is a raw image
    container — downstream image stages apply unchanged."""
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.equal(t.column("kind"), pa.scalar("video")))
        ids, fidx, payloads = [], [], []
        for mid, data in zip(
            sel.column("media_id").to_pylist(), sel.column("payload").to_pylist()
        ):
            parsed = _parse_payload(data)
            if parsed is None or parsed[0] != 2:
                continue
            _, w, h, n, body = parsed
            frames = np.frombuffer(body, np.uint8).reshape(n, h, w, 3)
            for i in range(0, n, every):
                ids.append(mid)
                fidx.append(i)
                payloads.append(_pack(0, w, h, 1, frames[i]))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return media.map_batches(f, batch_format="pyarrow", batch_size=MEDIA_BATCH_SIZE)


# ----------------------------------------------------------------------
# deterministic media embeddings (feed the similarity-search family)
# ----------------------------------------------------------------------
def media_embeddings(media, *, dim: int = 16):
    """payload -> unit-norm float vector via md5-seeded projection —
    a deterministic stand-in with the exact schema a learned encoder
    would emit (list<float> 'embedding'), so ANN stages compose."""

    def f(t: pa.Table) -> pa.Table:
        ids, vecs = [], []
        for mid, data in zip(
            t.column("media_id").to_pylist(), t.column("payload").to_pylist()
        ):
            # md5 seeds a splitmix expansion to dim INDEPENDENT draws
            # (repeating the 16-byte digest would collapse every vector
            # into a 2-D subspace and make all cosines ~±1)
            base = int.from_bytes(hashlib.md5(data).digest()[:8], "little")
            raw = _streams(np.arange(dim, dtype=np.uint64), base & 0x7FFFFFFF, 1)[:, 0]
            v = (raw.astype(np.float64) / 2**64) - 0.5
            v /= np.linalg.norm(v) or 1.0
            ids.append(mid)
            vecs.append(v)
        flat = np.concatenate(vecs) if vecs else np.zeros(0)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(flat, pa.float32()), dim
                ),
            }
        )

    return media.map_batches(f, batch_format="pyarrow", batch_size=MEDIA_BATCH_SIZE)
