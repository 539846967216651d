"""Multimodal plumbing: fake-container decode stages (schema/actor/batch real)."""

import ray.data

from document_text_extraction_ray.stages import multimodal as MM


def test_image_features_stage():
    rows = [
        {"img_id": i, "payload": MM.encode_fake_image(32 + i, 24 + i, seed=i)}
        for i in range(20)
    ]
    rows.append({"img_id": 99, "payload": b"not an image"})
    ds = ray.data.from_items(rows)
    out = MM.image_features(ds, concurrency=2, batch_size=8).to_pandas()
    ok = out[out["decode_status"] == "ok"]
    assert len(ok) == 20
    feats = {r["img_id"]: r["image_features"] for _, r in out.iterrows()}
    assert feats[0]["width"] == 32 and feats[0]["height"] == 24
    assert 0 < feats[0]["mean_intensity"] < 255
    bad = out[out["img_id"] == 99].iloc[0]
    assert bad["decode_status"].startswith("error")
    assert bad["image_features"]["width"] == 0


def test_image_resize_deterministic():
    blob = MM.encode_fake_image(64, 64, seed=1)
    ds = ray.data.from_items([{"img_id": 0, "payload": blob}])
    a = MM.image_features(ds, concurrency=1, resize_to=8).to_pandas()
    b = MM.image_features(ds, concurrency=1, resize_to=8).to_pandas()
    assert (
        a["image_features"][0]["checksum"] == b["image_features"][0]["checksum"]
    )
    full = MM.image_features(ds, concurrency=1).to_pandas()
    assert full["image_features"][0]["checksum"] != a["image_features"][0]["checksum"]


def test_audio_features_stage():
    rows = [
        {"aud_id": i, "payload": MM.encode_fake_audio(16000 * (i + 1), 16000, seed=i)}
        for i in range(5)
    ]
    ds = ray.data.from_items(rows)
    out = MM.audio_features(ds, concurrency=1).to_pandas()
    assert set(out["decode_status"]) == {"ok"}
    feats = sorted(
        (r["audio_features"] for _, r in out.iterrows()),
        key=lambda f: f["n_samples"],
    )
    assert feats[0]["duration_s"] == 1.0
    assert feats[4]["duration_s"] == 5.0
    assert all(f["rms"] > 0 for f in feats)


def test_video_frame_sample_stage():
    rows = [
        {"vid_id": i,
         "payload": MM.encode_fake_video(20 + i, 16, 12, fps=24, seed=i)}
        for i in range(6)
    ]
    rows.append({"vid_id": 99, "payload": b"junk"})
    ds = ray.data.from_items(rows)
    out = MM.video_frame_samples(ds, every=5, concurrency=1).to_pandas()
    ok = out[out["decode_status"] == "ok"]
    assert len(ok) == 6
    f0 = out[out["vid_id"] == 0]["video_features"].iloc[0]
    assert f0["n_frames"] == 20 and f0["sampled_frames"] == 4
    assert len(list(f0["frame_checksums"])) == 4
    # Deterministic across runs
    again = MM.video_frame_samples(ds, every=5, concurrency=1).to_pandas()
    g0 = again[again["vid_id"] == 0]["video_features"].iloc[0]
    assert list(g0["frame_checksums"]) == list(f0["frame_checksums"])
    assert out[out["vid_id"] == 99]["decode_status"].iloc[0].startswith("error")


def test_image_dhash_identical_images_and_error_rows():
    """Identical pixels -> identical hash; a different seed flips bits;
    a corrupt payload yields an in-band error row."""
    import pyarrow as pa
    import ray.data as rd

    from document_text_extraction_ray.stages.multimodal import (
        encode_fake_image,
        image_dhash,
    )

    rows = [
        {"img_id": 0, "payload": encode_fake_image(40, 30, seed=7)},
        {"img_id": 1, "payload": encode_fake_image(40, 30, seed=7)},
        {"img_id": 2, "payload": encode_fake_image(40, 30, seed=8)},
        {"img_id": 3, "payload": b"not an image"},
    ]
    t = pa.Table.from_pylist(rows, schema=pa.schema(
        [("img_id", pa.int64()), ("payload", pa.large_binary())]))
    out = image_dhash(rd.from_arrow(t)).to_pandas() \
        .sort_values("img_id").reset_index(drop=True)
    assert (out.loc[0, "hash_lo"], out.loc[0, "hash_hi"]) == \
           (out.loc[1, "hash_lo"], out.loc[1, "hash_hi"])
    assert (out.loc[2, "hash_lo"], out.loc[2, "hash_hi"]) != \
           (out.loc[0, "hash_lo"], out.loc[0, "hash_hi"])
    assert out.loc[3, "status"] == "error"
    assert out.loc[3, "hash_lo"] == -1
    assert (out.loc[:2, "status"] == "ok").all()
    # halves stay inside unsigned-32 range (int64-safe packing)
    assert (out.loc[:2, ["hash_lo", "hash_hi"]] >= 0).all().all()
    assert (out.loc[:2, ["hash_lo", "hash_hi"]] < (1 << 32)).all().all()


def test_audio_fingerprint_identity_and_short_clip_error():
    """Same samples -> same fingerprint; volume DOUBLING preserves the
    gradient bits (direction-invariance); too-short clips error in-band."""
    import struct

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from document_text_extraction_ray.stages.multimodal import (
        FAKE_AUD_MAGIC,
        audio_fingerprint,
        encode_fake_audio,
    )

    a = encode_fake_audio(4000, 16000, seed=3)
    # volume x2 clip: same header, doubled samples (clipped to int16 range)
    n, sr = struct.unpack_from("<II", a, len(FAKE_AUD_MAGIC))
    s = np.frombuffer(a, np.int16, offset=len(FAKE_AUD_MAGIC) + 8)
    loud = FAKE_AUD_MAGIC + struct.pack("<II", n, sr) + \
        (s.astype(np.int32) * 2).clip(-32768, 32767).astype(np.int16).tobytes()
    rows = [
        {"clip_id": 0, "payload": a},
        {"clip_id": 1, "payload": a},
        {"clip_id": 2, "payload": loud},
        {"clip_id": 3, "payload": encode_fake_audio(10, 16000, seed=3)},
        {"clip_id": 4, "payload": b"junk"},
    ]
    t = pa.Table.from_pylist(rows, schema=pa.schema(
        [("clip_id", pa.int64()), ("payload", pa.large_binary())]))
    out = audio_fingerprint(rd.from_arrow(t)).to_pandas() \
        .sort_values("clip_id").reset_index(drop=True)
    assert out.loc[0, "fingerprint"] == out.loc[1, "fingerprint"]
    assert out.loc[0, "fingerprint"] == out.loc[2, "fingerprint"]  # volume-proof
    assert out.loc[3, "status"] == "error"      # 10 samples < 33 frames
    assert out.loc[4, "status"] == "error"
    assert out.loc[0, "status"] == "ok" and out.loc[0, "n_samples"] == 4000


def test_scene_changes_brute_force_and_errors(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from document_text_extraction_ray.stages.multimodal import (
        encode_fake_video, scene_changes, FAKE_VID_MAGIC,
    )
    import struct

    rows = []
    expected = {}
    rng_cases = [(1, 4, 4), (2, 5, 3), (7, 8, 6), (12, 3, 3)]
    for i, (nf, w, h) in enumerate(rng_cases):
        blob = encode_fake_video(nf, w, h, seed=i)
        rows.append({"doc_id": i, "payload": blob})
        plane = np.frombuffer(blob, dtype=np.uint8,
                              offset=len(FAKE_VID_MAGIC) + 16)
        e = plane.reshape(nf, w * h).sum(axis=1, dtype=np.int64)
        d = np.abs(np.diff(e))
        thr = 50
        cuts = np.nonzero(d >= thr)[0]
        expected[i] = (nf, len(cuts) + 1,
                       int(cuts[0]) + 1 if len(cuts) else -1,
                       int(d.max()) if d.size else 0)
    # stitched two-scene clip: bright second half must be one cut
    w, h, nf, k = 4, 4, 6, 3
    a = (np.arange(k * w * h) * 7 % 100).astype(np.uint8)
    b = (np.arange((nf - k) * w * h) * 7 % 100 + 150).astype(np.uint8)
    blob = (FAKE_VID_MAGIC + struct.pack("<IIII", nf, 24, w, h)
            + np.concatenate([a, b]).tobytes())
    rows.append({"doc_id": 100, "payload": blob})
    rows.append({"doc_id": 101, "payload": b"JUNK"})

    t = pa.Table.from_pylist(rows, schema=pa.schema(
        [("doc_id", pa.int64()), ("payload", pa.large_binary())]))
    out = scene_changes(rd.from_arrow(t), threshold=50).to_pandas() \
        .set_index("doc_id")
    for i, (nf_, ns, fb, mx) in expected.items():
        r = out.loc[i]
        assert (r.n_frames, r.n_scenes, r.first_boundary, r.max_delta) == \
            (nf_, ns, fb, mx)
        assert r.status == "ok"
    r = out.loc[100]
    # bright shift = 150*16 = 2400 >> within-scene deltas; exactly one cut
    assert r.n_scenes == 2 and r.first_boundary == 3
    assert out.loc[101].status == "error" and out.loc[101].n_scenes == -1


def test_image_patches_cover_exactly_and_errors(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from document_text_extraction_ray.stages.multimodal import (
        encode_fake_image, image_patches, _decode_fake_image,
    )

    rows = [{"img_id": i, "payload": encode_fake_image(5 + i, 3 + i, seed=i)}
            for i in range(4)]
    rows.append({"img_id": 99, "payload": b"BAD"})
    t = pa.Table.from_pylist(rows, schema=pa.schema(
        [("img_id", pa.int64()), ("payload", pa.large_binary())]))
    out = image_patches(rd.from_arrow(t), grid=3).to_pandas()
    for i in range(4):
        img = _decode_fake_image(rows[i]["payload"]).astype(np.int64)
        sub = out[out.img_id == i]
        assert len(sub) == 9
        # partition property: patch sums and dims add back to the image
        assert sub.pixel_sum.sum() == img.sum()
        assert sub[sub.px == 0].patch_h.sum() == img.shape[0]
        assert sub[sub.py == 0].patch_w.sum() == img.shape[1]
        # spot-check one interior cell against numpy
        h, w = img.shape
        r = sub[(sub.py == 1) & (sub.px == 1)].iloc[0]
        assert r.pixel_sum == img[h // 3: h * 2 // 3,
                                  w // 3: w * 2 // 3].sum()
    err = out[out.img_id == 99]
    assert len(err) == 1 and err.iloc[0].status == "error"


def test_vad_segments_islands_and_error_rows(ray_session):
    import struct

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from document_text_extraction_ray.stages.multimodal import (
        FAKE_AUD_MAGIC, vad_segments)

    # 6 frames of 4 samples: loud, loud, quiet, loud, quiet, quiet
    pattern = [1000, 1000, 0, 1000, 0, 0]
    s = np.repeat(np.array(pattern, np.int16), 4)
    blob = FAKE_AUD_MAGIC + struct.pack("<II", len(s), 8000) + s.tobytes()
    rows = [{"doc_id": 1, "payload": blob},
            {"doc_id": 2, "payload": b"junk"}]
    schema = pa.schema([("doc_id", pa.int64()),
                        ("payload", pa.large_binary())])
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=schema))
    df = vad_segments(ds, frame_len=4, threshold=2000).to_pandas() \
        .set_index("doc_id")
    assert df.loc[1, "n_frames"] == 6
    assert df.loc[1, "n_active"] == 3
    assert df.loc[1, "n_segments"] == 2  # [0,1] and [3]
    assert df.loc[1, "longest"] == 2
    assert df.loc[2, "status"] == "error"
