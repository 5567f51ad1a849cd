"""Multimodal stages: synth media, decode, resize, audio, frames,
embeddings (the plumbing is real; compressed decode is the documented
stub)."""

import numpy as np
import pyarrow as pa
import pytest

from octoray.stages import multimodal as M


def test_synth_deterministic_across_batching():
    a = M.synth_media_batch(np.arange(10))
    b = pa.concat_tables(
        [M.synth_media_batch(np.arange(0, 5)), M.synth_media_batch(np.arange(5, 10))]
    )
    assert a.equals(b)
    kinds = a.column("kind").to_pylist()
    assert set(kinds) == {"image", "audio", "video"}


def test_decode_roundtrip():
    t = M.synth_media_batch(np.array([0]))  # id 0 -> image
    dec = M.ImageDecoder()
    img = dec.decode(t.column("payload")[0].as_py())
    assert img.shape == (t.column("meta_h")[0].as_py(), t.column("meta_w")[0].as_py(), 3)
    with pytest.raises(NotImplementedError):
        dec.decode(b"\x89PNG1234567890123456")  # foreign format, no PIL


def test_resize_real_math():
    r = M.ImageResizer(out_w=8, out_h=8)
    t = M.synth_media_batch(np.array([0]))
    out = r(t)
    img = M.ImageDecoder().decode(out.column("payload")[0].as_py())
    assert img.shape == (8, 8, 3)
    # nearest-neighbor: corner pixel preserved
    src = M.ImageDecoder().decode(t.column("payload")[0].as_py())
    assert (img[0, 0] == src[0, 0]).all()


def test_pipeline_stages(ray_session):
    media = M.media_dataset(30)
    feats = M.image_features(media, concurrency=(1, 2)).take_all()
    assert len(feats) == 10  # ids 0,3,6,... are images
    assert all(0 <= r["mean_r"] <= 255 for r in feats)

    au = M.audio_features(media).take_all()
    assert len(au) == 10
    assert all(r["n_samples"] == 1600 and r["rms"] > 0 for r in au)

    fr = M.sample_frames(media, every=2).take_all()
    assert len(fr) > 10  # 10 videos x >=2 sampled frames
    # sampled frames decode as images
    img = M.ImageDecoder().decode(fr[0]["payload"])
    assert img.shape == (16, 16, 3)

    emb = M.media_embeddings(media, dim=16).take_all()
    assert len(emb) == 30
    v = np.array(emb[0]["embedding"])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5


def test_image_ahash_handcomputed_and_deterministic(ray_session):
    """aHash bits match a hand computation on a constructed gradient
    image; equal payloads collide; hash is grid^2 chars of 0/1."""
    import ray.data as rd

    # 8x8 image: left half dark (0), right half bright (200)
    img = np.zeros((8, 8, 3), np.uint8)
    img[:, 4:, :] = 200
    payload = M._pack(0, 8, 8, 1, img)
    t = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "kind": pa.array(["image", "image"]),
        "payload": pa.array([payload, payload], pa.binary()),
    })
    out = (M.image_ahash(rd.from_arrow(t), grid=8, concurrency=(1, 1))
           .to_pandas().sort_values("media_id"))
    assert len(out) == 2
    h1, h2 = out["ahash"].tolist()
    assert h1 == h2 and len(h1) == 64 and set(h1) <= {"0", "1"}
    # mean gray3 = 300; sampled columns 0-3 are 0 (bit 0), 4-7 are 600
    assert h1 == ("0000" + "1111") * 8
    # full pipeline over synth media: one hash per image, stable
    media = M.media_dataset(30)
    a = M.image_ahash(media, concurrency=(1, 2)).to_pandas()
    b = M.image_ahash(media, concurrency=(1, 2)).to_pandas()
    assert len(a) == 10
    assert a.sort_values("media_id").equals(b.sort_values("media_id"))


def test_media_embeddings_feed_knn(ray_session):
    """Media embeddings compose with the similarity-search family."""
    from octoray.stages.similarity import knn_brute

    media = M.media_dataset(40)
    emb = M.media_embeddings(media, dim=16)
    out = knn_brute(emb, [0, 1], k=3).take_all()
    assert {r["query_id"] for r in out} == {0, 1}
    assert all(r["neighbor_id"] != r["query_id"] for r in out)


def test_image_dedup_groups_recrawls(ray_session):
    """Identical payloads under different ids collapse onto the min
    media_id with the right group size; distinct images stay apart."""
    import numpy as np
    import ray.data as rd

    img_a = np.full(8 * 8 * 3, 9, dtype=np.uint8)
    img_a[: 8 * 3] = 200  # top row bright -> nontrivial hash
    img_b = np.zeros(8 * 8 * 3, dtype=np.uint8)
    img_b[-8 * 3:] = 200
    pa_, pb_ = M._pack(0, 8, 8, 1, img_a), M._pack(0, 8, 8, 1, img_b)
    t = pa.table({
        "media_id": pa.array([5, 1, 9, 3], pa.int64()),
        "kind": pa.array(["image"] * 4),
        "payload": pa.array([pa_, pa_, pa_, pb_], pa.binary()),
    })
    out = (M.image_dedup(rd.from_arrow(t), grid=8, concurrency=(1, 1))
           .to_pandas().sort_values("media_id").reset_index(drop=True))
    assert out["media_id"].tolist() == [1, 3]
    assert out["n_dups"].tolist() == [3, 1]


def test_audio_fingerprint_hand_case(ray_session):
    """Band bits follow the integer cross-multiplied threshold;
    identical PCM under different ids collides; n < bands is safe."""
    import ray.data as rd

    loud = np.zeros(80, dtype=np.int16)
    loud[:10] = 1000  # all energy in band 0
    pa_ = M._pack(1, 0, 0, 80, loud)
    tiny = M._pack(1, 0, 0, 3, np.array([5, -5, 5], dtype=np.int16))
    t = pa.table({
        "media_id": pa.array([1, 2, 3], pa.int64()),
        "kind": pa.array(["audio"] * 3),
        "payload": pa.array([pa_, pa_, tiny], pa.binary()),
    })
    out = (M.audio_fingerprint(rd.from_arrow(t), bands=8)
           .to_pandas().sort_values("media_id"))
    h = out["afp"].tolist()
    assert h[0] == h[1] == "10000000"
    assert len(h[2]) == 8 and set(h[2]) <= {"0", "1"}
