"""Multimodal columns: opaque binary payloads + typed metadata, processed by
actor-pool map_batches stages (decode / feature-extract / resize / frame-sample).

The real image/audio codecs are not available in this environment, so the
decode step is STUBBED two ways (both clearly marked):
  * real codecs (PIL / cv2 / soundfile) are import-guarded — if present they
    are used;
  * otherwise a deterministic FAKE container format ("FAKEIMG"/"FAKEAUD"
    headers, struct-packed dims + raw payload) keeps the Ray-side plumbing —
    schemas, batch sizing, actor signatures, output layout — fully real and
    testable.

Payload-heavy sizing rule (SURVEY.md §4.1 memory row): binary rows are big,
so these stages default to small ``batch_size`` and pyarrow batch format (no
pandas object-dtype copies of the blobs).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

FAKE_IMG_MAGIC = b"FAKEIMG1"
FAKE_AUD_MAGIC = b"FAKEAUD1"

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401
    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def encode_fake_image(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic fake image container: magic + dims + pixel bytes from a
    CLOSED-FORM generator, ``px[j] = (seed*2654435761 + j*2246822519) % 256``
    — chosen over a seeded Mersenne stream so an external oracle (plain SQL
    over ``range(w*h)``) can reconstruct the pixels and therefore verify the
    decode + feature kernels end-to-end, not just the container header."""
    j = np.arange(width * height, dtype=np.int64)
    payload = ((seed * 2654435761 + j * 2246822519) % 256).astype(np.uint8)
    return FAKE_IMG_MAGIC + struct.pack("<II", width, height) + payload.tobytes()


def encode_fake_audio(n_samples: int, sample_rate: int, seed: int = 0) -> bytes:
    """Closed-form samples (same rationale as ``encode_fake_image``):
    ``s[j] = (seed*2654435761 + j*2246822519) % 4001 - 2000`` — int16-range
    pseudo-noise a SQL oracle can reconstruct sample-exactly."""
    j = np.arange(n_samples, dtype=np.int64)
    payload = ((seed * 2654435761 + j * 2246822519) % 4001 - 2000).astype(np.int16)
    return FAKE_AUD_MAGIC + struct.pack("<II", n_samples, sample_rate) + payload.tobytes()


def _decode_fake_image(blob: bytes):
    if not blob.startswith(FAKE_IMG_MAGIC):
        raise ValueError("not a FAKEIMG payload")
    w, h = struct.unpack_from("<II", blob, len(FAKE_IMG_MAGIC))
    px = np.frombuffer(blob, dtype=np.uint8, offset=len(FAKE_IMG_MAGIC) + 8)
    return px.reshape(h, w) if px.size == w * h else px[: w * h].reshape(h, w)


IMAGE_FEATURES_TYPE = pa.struct(
    [
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("mean_intensity", pa.float64()),
        ("std_intensity", pa.float64()),
        # Integer pixel sum: the float mean can't be hash-compared against an
        # external SQL oracle (summation-order rounding), the exact sum can.
        ("sum_intensity", pa.int64()),
        ("checksum", pa.int64()),
    ]
)


class ImageFeatureStage:
    """Actor-pool stage: decode image payloads -> scalar features.

    Real decode (PIL) when available; FAKEIMG container otherwise.  Anything
    undecodable yields an in-band error row (status column), never a task
    failure — the reference's poison-document policy."""

    def __init__(self, payload_column: str = "payload", resize_to: int = 0):
        self.payload_column = payload_column
        self.resize_to = resize_to
        # Real-codec hook: when PIL is present, non-FAKEIMG payloads could be
        # routed through Image.open here. Not exercised in this environment.
        self.have_real_codec = _HAVE_PIL

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, statuses = [], []
        for blob in batch.column(self.payload_column).to_pylist():
            try:
                img = _decode_fake_image(blob)
                if self.resize_to:
                    # Nearest-neighbor "resize": deterministic index sampling.
                    ys = np.linspace(0, img.shape[0] - 1, self.resize_to).astype(int)
                    xs = np.linspace(0, img.shape[1] - 1, self.resize_to).astype(int)
                    img = img[np.ix_(ys, xs)]
                feats.append(
                    {
                        "width": int(img.shape[1]),
                        "height": int(img.shape[0]),
                        "mean_intensity": float(img.mean()),
                        "std_intensity": float(img.std()),
                        "sum_intensity": int(img.sum(dtype=np.int64)),
                        "checksum": int(zlib.crc32(img.tobytes())),
                    }
                )
                statuses.append("ok")
            except Exception as exc:
                feats.append(
                    {"width": 0, "height": 0, "mean_intensity": 0.0,
                     "std_intensity": 0.0, "sum_intensity": 0, "checksum": 0}
                )
                statuses.append(f"error: {type(exc).__name__}")
        batch = batch.append_column(
            pa.field("image_features", IMAGE_FEATURES_TYPE),
            pa.array(feats, IMAGE_FEATURES_TYPE),
        )
        return batch.append_column("decode_status", pa.array(statuses, pa.string()))


AUDIO_FEATURES_TYPE = pa.struct(
    [
        ("n_samples", pa.int32()),
        ("sample_rate", pa.int32()),
        ("duration_s", pa.float64()),
        ("rms", pa.float64()),
        # Exact integer sum of squared samples: hash-comparable against a
        # SQL oracle where the float rms is not (rounding order).
        ("sum_sq", pa.int64()),
    ]
)


class AudioFeatureStage:
    """Actor-pool stage: audio payloads -> duration/RMS features (FAKEAUD)."""

    def __init__(self, payload_column: str = "payload", frame_sample_every: int = 0):
        self.payload_column = payload_column
        self.frame_sample_every = frame_sample_every

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, statuses = [], []
        for blob in batch.column(self.payload_column).to_pylist():
            try:
                if not blob.startswith(FAKE_AUD_MAGIC):
                    raise ValueError("not a FAKEAUD payload")
                n, sr = struct.unpack_from("<II", blob, len(FAKE_AUD_MAGIC))
                samples = np.frombuffer(
                    blob, dtype=np.int16, offset=len(FAKE_AUD_MAGIC) + 8
                )[:n].astype(np.float64)
                if self.frame_sample_every:
                    samples = samples[:: self.frame_sample_every]
                feats.append(
                    {
                        "n_samples": int(n),
                        "sample_rate": int(sr),
                        "duration_s": float(n / sr) if sr else 0.0,
                        "rms": float(np.sqrt((samples ** 2).mean())) if samples.size else 0.0,
                        "sum_sq": int((samples.astype(np.int64) ** 2).sum()),
                    }
                )
                statuses.append("ok")
            except Exception as exc:
                feats.append({"n_samples": 0, "sample_rate": 0,
                              "duration_s": 0.0, "rms": 0.0, "sum_sq": 0})
                statuses.append(f"error: {type(exc).__name__}")
        batch = batch.append_column(
            pa.field("audio_features", AUDIO_FEATURES_TYPE),
            pa.array(feats, AUDIO_FEATURES_TYPE),
        )
        return batch.append_column("decode_status", pa.array(statuses, pa.string()))


def image_features(ds, payload_column: str = "payload",
                   concurrency: int = 4, batch_size: int = 16, **kw):
    """Small batch_size: payload bytes x batch x concurrency must fit a
    worker heap (multi-MB blobs => 16 rows/batch)."""
    from ..util import pool_size

    concurrency = pool_size(concurrency)
    return ds.map_batches(
        ImageFeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(payload_column=payload_column, **kw),
    )


def audio_features(ds, payload_column: str = "payload",
                   concurrency: int = 4, batch_size: int = 16, **kw):
    from ..util import pool_size

    concurrency = pool_size(concurrency)
    return ds.map_batches(
        AudioFeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(payload_column=payload_column, **kw),
    )


FAKE_VID_MAGIC = b"FAKEVID1"

VIDEO_FEATURES_TYPE = pa.struct(
    [
        ("n_frames", pa.int32()),
        ("fps", pa.int32()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sampled_frames", pa.int32()),
        ("frame_checksums", pa.list_(pa.int64())),
        # Exact integer pixel sum over the SAMPLED frames — SQL-oracle
        # comparable (a list of crc32s is not).
        ("sampled_pixel_sum", pa.int64()),
    ]
)


def encode_fake_video(n_frames: int, width: int, height: int, fps: int = 24,
                      seed: int = 0) -> bytes:
    """Closed-form frame planes (same rationale as ``encode_fake_image``):
    pixel j of the flattened plane is
    ``(seed*2654435761 + j*2246822519) % 256``."""
    j = np.arange(n_frames * width * height, dtype=np.int64)
    frames = ((seed * 2654435761 + j * 2246822519) % 256).astype(np.uint8)
    return (FAKE_VID_MAGIC + struct.pack("<IIII", n_frames, fps, width, height)
            + frames.tobytes())


class VideoFrameSampleStage:
    """Actor-pool stage: sample every k-th frame of a video payload and emit
    per-frame features — the frame-sample step of the multimodal mandate.
    Real decoders (cv2/ffmpeg) are absent; the FAKEVID container keeps the
    plumbing (schema, sampling stride, per-frame work) real."""

    def __init__(self, payload_column: str = "payload", every: int = 5):
        self.payload_column = payload_column
        self.every = max(1, every)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, statuses = [], []
        for blob in batch.column(self.payload_column).to_pylist():
            try:
                if not blob.startswith(FAKE_VID_MAGIC):
                    raise ValueError("not a FAKEVID payload")
                n, fps, w, h = struct.unpack_from("<IIII", blob, len(FAKE_VID_MAGIC))
                plane = np.frombuffer(
                    blob, dtype=np.uint8, offset=len(FAKE_VID_MAGIC) + 16
                )[: n * w * h].reshape(n, h, w)
                sampled = plane[:: self.every]
                feats.append(
                    {
                        "n_frames": int(n), "fps": int(fps),
                        "width": int(w), "height": int(h),
                        "sampled_frames": int(sampled.shape[0]),
                        "frame_checksums": [
                            int(zlib.crc32(f.tobytes())) for f in sampled
                        ],
                        "sampled_pixel_sum": int(sampled.sum(dtype=np.int64)),
                    }
                )
                statuses.append("ok")
            except Exception as exc:
                feats.append({"n_frames": 0, "fps": 0, "width": 0, "height": 0,
                              "sampled_frames": 0, "frame_checksums": [],
                              "sampled_pixel_sum": 0})
                statuses.append(f"error: {type(exc).__name__}")
        batch = batch.append_column(
            pa.field("video_features", VIDEO_FEATURES_TYPE),
            pa.array(feats, VIDEO_FEATURES_TYPE),
        )
        return batch.append_column("decode_status", pa.array(statuses, pa.string()))


def video_frame_samples(ds, payload_column: str = "payload", every: int = 5,
                        concurrency: int = 4, batch_size: int = 8, **kw):
    """Video payloads are the largest: batch_size 8 keeps batch bytes sane."""
    from ..util import pool_size

    return ds.map_batches(
        VideoFrameSampleStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        fn_constructor_kwargs=dict(payload_column=payload_column, every=every, **kw),
    )


def image_dhash(ds, payload_column: str = "payload",
                id_column: str = "img_id"):
    """Perceptual difference-hash (dHash) per image: nearest-neighbor
    resample to 9x8 (the same deterministic index-sampling kernel the
    oracled resize stage uses), then bit(y, x) = 1 iff px[y,x] <
    px[y,x+1] — 64 gradient bits, returned as two int64 halves
    (hash_lo = bits 0..31, hash_hi = bits 32..63; int64 halves keep the
    SQL replay unsigned-safe).  Equal hashes ~ visually-near-duplicate
    images: the multimodal sibling of SimHash text dedup — group by
    (hash_hi, hash_lo) downstream for dup clusters.

    Row-local map_batches, zero shuffles; undecodable payloads emit an
    in-band error row (hash halves -1, status 'error')."""

    def scan(t: pa.Table) -> pa.Table:
        ids, los, his, status = [], [], [], []
        for iid, blob in zip(t.column(id_column).to_pylist(),
                             t.column(payload_column).to_pylist()):
            ids.append(iid)
            try:
                img = _decode_fake_image(blob)
                ys = np.linspace(0, img.shape[0] - 1, 8).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, 9).astype(int)
                g = img[np.ix_(ys, xs)].astype(np.int16)
                bits = (g[:, :-1] < g[:, 1:]).astype(np.uint64).ravel()
                w = np.arange(64, dtype=np.uint64)
                lo = int((bits[:32] << w[:32]).sum())
                hi = int((bits[32:] << w[:32]).sum())
                los.append(lo)
                his.append(hi)
                status.append("ok")
            except Exception:
                los.append(-1)
                his.append(-1)
                status.append("error")
        return pa.table({
            id_column: pa.array(ids, t.schema.field(id_column).type),
            "hash_lo": pa.array(los, pa.int64()),
            "hash_hi": pa.array(his, pa.int64()),
            "status": pa.array(status, pa.string()),
        })

    return ds.map_batches(scan, batch_format="pyarrow")


def audio_fingerprint(ds, payload_column: str = "payload",
                      id_column: str = "clip_id", n_frames: int = 33):
    """Frame-energy FINGERPRINT per audio clip (the audio sibling of
    ``image_dhash``, the shape of chromaprint's energy-gradient bits):
    the clip is cut into ``n_frames`` equal frames of L = n_samples //
    n_frames samples (tail remainder dropped), frame energy = Σ|s|, and
    bit f = 1 iff E_f < E_{f+1} — n_frames-1 gradient bits packed into
    one int64.  Robust to volume scaling direction-wise, integer-exact,
    SQL-replayable from the closed-form fake samples.

    Row-local map_batches, zero shuffles; clips shorter than n_frames
    samples (L = 0) and undecodable payloads emit in-band error rows."""

    def scan(t: pa.Table) -> pa.Table:
        ids, fps, lens, status = [], [], [], []
        for cid, blob in zip(t.column(id_column).to_pylist(),
                             t.column(payload_column).to_pylist()):
            ids.append(cid)
            try:
                if not blob.startswith(FAKE_AUD_MAGIC):
                    raise ValueError("not FAKEAUD")
                n, _sr = struct.unpack_from(
                    "<II", blob, len(FAKE_AUD_MAGIC))
                s = np.frombuffer(blob, dtype=np.int16,
                                  offset=len(FAKE_AUD_MAGIC) + 8,
                                  count=n).astype(np.int64)
                L = n // n_frames
                if L == 0:
                    raise ValueError("clip shorter than n_frames")
                e = np.abs(s[:L * n_frames]).reshape(n_frames, L).sum(axis=1)
                bits = (e[:-1] < e[1:]).astype(np.uint64)
                w = np.arange(n_frames - 1, dtype=np.uint64)
                fps.append(int((bits << w).sum()))
                lens.append(int(n))
                status.append("ok")
            except Exception:
                fps.append(-1)
                lens.append(-1)
                status.append("error")
        return pa.table({
            id_column: pa.array(ids, t.schema.field(id_column).type),
            "fingerprint": pa.array(fps, pa.int64()),
            "n_samples": pa.array(lens, pa.int64()),
            "status": pa.array(status, pa.string()),
        })

    return ds.map_batches(scan, batch_format="pyarrow")


def scene_changes(ds, payload_column: str = "payload",
                  id_column: str = "doc_id", threshold: int = 3072):
    """Scene-change detection per video payload: frame energy E_f = exact
    integer pixel sum per frame, boundary wherever the consecutive-frame
    energy jump |E_f - E_{f-1}| >= ``threshold`` — the shot-boundary
    heuristic real frame-diff detectors (ffmpeg ``select=gt(scene,..)``)
    apply, over the deterministic FAKEVID container (real decoders are
    absent; the plumbing — per-frame reduction, boundary scan, in-band
    errors — is the real engine surface).

    Output per clip: n_frames, n_scenes (boundaries + 1), first_boundary
    (frame index of the first cut, -1 if none), max_delta — all exact
    integers, so the oracle replays the closed-form frame sums and the
    boundary rule bit for bit.  Row-local ``map_batches``, zero shuffles;
    undecodable payloads emit in-band error rows."""

    def scan(t: pa.Table) -> pa.Table:
        ids, nfs, nsc, fb, mx, status = [], [], [], [], [], []
        for did, blob in zip(t.column(id_column).to_pylist(),
                             t.column(payload_column).to_pylist()):
            ids.append(did)
            try:
                if not blob.startswith(FAKE_VID_MAGIC):
                    raise ValueError("not a FAKEVID payload")
                n, fps, w, h = struct.unpack_from(
                    "<IIII", blob, len(FAKE_VID_MAGIC))
                plane = np.frombuffer(
                    blob, dtype=np.uint8,
                    offset=len(FAKE_VID_MAGIC) + 16)[: n * w * h]
                if plane.size != n * w * h:
                    raise ValueError("truncated plane")
                e = plane.reshape(n, w * h).sum(axis=1, dtype=np.int64)
                d = np.abs(np.diff(e))
                cuts = np.nonzero(d >= threshold)[0]
                nfs.append(int(n))
                nsc.append(int(len(cuts)) + 1)
                fb.append(int(cuts[0]) + 1 if len(cuts) else -1)
                mx.append(int(d.max()) if d.size else 0)
                status.append("ok")
            except Exception:
                nfs.append(-1)
                nsc.append(-1)
                fb.append(-1)
                mx.append(-1)
                status.append("error")
        return pa.table({
            id_column: pa.array(ids, t.schema.field(id_column).type),
            "n_frames": pa.array(nfs, pa.int64()),
            "n_scenes": pa.array(nsc, pa.int64()),
            "first_boundary": pa.array(fb, pa.int64()),
            "max_delta": pa.array(mx, pa.int64()),
            "status": pa.array(status, pa.string()),
        })

    return ds.map_batches(scan, batch_format="pyarrow")


def image_patches(ds, grid: int = 4, payload_column: str = "payload",
                  id_column: str = "img_id"):
    """ViT-style patch extraction: the image splits into a ``grid`` x
    ``grid`` cell grid (cell = floor-division pixel ranges, remainders to
    the last row/column — every pixel in exactly one patch) and each
    patch emits one row with its exact integer pixel sum and dims — the
    one-row-to-many-rows explode a vision-training pipeline runs before
    patch-level filtering/embedding.  Row-local flat explode inside
    ``map_batches`` (no flat_map-per-row Python), zero shuffles;
    undecodable payloads emit one in-band error row (patch -1)."""

    def explode(t: pa.Table) -> pa.Table:
        ids, pys, pxs, ws, hs, sums, status = [], [], [], [], [], [], []
        for iid, blob in zip(t.column(id_column).to_pylist(),
                             t.column(payload_column).to_pylist()):
            try:
                img = _decode_fake_image(blob).astype(np.int64)
                h, w = img.shape
                ye = [h * i // grid for i in range(grid + 1)]
                xe = [w * i // grid for i in range(grid + 1)]
                for gy in range(grid):
                    for gx in range(grid):
                        cell = img[ye[gy]:ye[gy + 1], xe[gx]:xe[gx + 1]]
                        ids.append(iid)
                        pys.append(gy)
                        pxs.append(gx)
                        hs.append(cell.shape[0])
                        ws.append(cell.shape[1])
                        sums.append(int(cell.sum()))
                        status.append("ok")
            except Exception:
                ids.append(iid)
                pys.append(-1)
                pxs.append(-1)
                hs.append(-1)
                ws.append(-1)
                sums.append(-1)
                status.append("error")
        return pa.table({
            id_column: pa.array(ids, t.schema.field(id_column).type),
            "py": pa.array(pys, pa.int64()),
            "px": pa.array(pxs, pa.int64()),
            "patch_h": pa.array(hs, pa.int64()),
            "patch_w": pa.array(ws, pa.int64()),
            "pixel_sum": pa.array(sums, pa.int64()),
            "status": pa.array(status, pa.string()),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


def vad_segments(ds, payload_column: str = "payload",
                 id_column: str = "doc_id", frame_len: int = 100,
                 threshold: int = 10_000):
    """Voice-activity detection per audio payload: frames of ``frame_len``
    samples score exact integer energy (sum of |sample|); a frame is
    ACTIVE when energy >= ``threshold``; consecutive active frames merge
    into segments (the webrtcvad-style energy gate over the FAKEAUD
    container — real codecs are absent, the framing/segmentation plumbing
    is the engine surface).

    Output per clip: n_frames, n_active, n_segments, longest (longest
    active run, frames) — exact integers; a trailing partial frame is
    dropped (standard framing).  Row-local, zero shuffles; undecodable
    payloads emit in-band error rows."""

    def scan(t: pa.Table) -> pa.Table:
        ids, nf, na, ns, lg, status = [], [], [], [], [], []
        for did, blob in zip(t.column(id_column).to_pylist(),
                             t.column(payload_column).to_pylist()):
            ids.append(did)
            try:
                if not blob.startswith(FAKE_AUD_MAGIC):
                    raise ValueError("not a FAKEAUD payload")
                n, _sr = struct.unpack_from("<II", blob,
                                            len(FAKE_AUD_MAGIC))
                samples = np.frombuffer(
                    blob, dtype=np.int16,
                    offset=len(FAKE_AUD_MAGIC) + 8)[:n].astype(np.int64)
                if samples.size != n:
                    raise ValueError("truncated samples")
                frames = n // frame_len
                e = np.abs(samples[:frames * frame_len]) \
                    .reshape(frames, frame_len).sum(axis=1)
                act = e >= threshold
                # islands: starts where active and (first or prev inactive)
                starts = act & ~np.concatenate([[False], act[:-1]])
                runs = []
                run = 0
                for a in act:
                    run = run + 1 if a else 0
                    runs.append(run)
                nf.append(int(frames))
                na.append(int(act.sum()))
                ns.append(int(starts.sum()))
                lg.append(int(max(runs)) if runs else 0)
                status.append("ok")
            except Exception:
                nf.append(-1)
                na.append(-1)
                ns.append(-1)
                lg.append(-1)
                status.append("error")
        return pa.table({
            id_column: pa.array(ids),
            "n_frames": pa.array(nf, pa.int64()),
            "n_active": pa.array(na, pa.int64()),
            "n_segments": pa.array(ns, pa.int64()),
            "longest": pa.array(lg, pa.int64()),
            "status": pa.array(status, pa.string()),
        })

    return ds.map_batches(scan, batch_format="pyarrow")
