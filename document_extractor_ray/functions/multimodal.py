"""Multimodal columns: image / audio / video payloads as opaque binary
columns with typed metadata, processed by actor-pool map_batches stages.

The decode step is STUBBED: this container has no image/audio codecs
(no PIL/libsndfile), so ``ImageDecoder.__init__`` probes for PIL and
falls back to the deterministic FIMG/FAUD fake codecs defined here
(same header-parse + ndarray-out contract a real decoder has).  The
Ray-side plumbing — schemas, batch sizes, actor signature, zero-copy
batch flow, output layout — is real and tested; swapping in a real
codec is a one-method change, and payloads a codec rejects surface as
``decode_ok=False`` rows, never exceptions.

Payload formats (deterministic fakes):
  FIMG: b"FIMG" + u16 width + u16 height + u8 channels + raw pixels
  FAUD: b"FAUD" + u32 sample_rate + u32 n_samples + i16 PCM samples
  FVID: b"FVID" + u16 n_frames + n * (u32 len + FIMG payload)
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
    ]
)

FEATURES_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("decode_ok", pa.bool_()),
        ("error", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("sample_rate", pa.int32()),
        ("n_units", pa.int32()),  # frames (video) / windows (audio) / 1 (image)
        ("features", pa.list_(pa.float32())),
    ]
)


# ---------------------------------------------------------------------------
# Deterministic fake codecs (payload encode/decode)
# ---------------------------------------------------------------------------

def encode_fake_image(width: int, height: int, channels: int, seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    pixels = rng.randint(0, 256, size=width * height * channels, dtype=np.uint8)
    return b"FIMG" + struct.pack("<HHB", width, height, channels) + pixels.tobytes()


def decode_fake_image(payload: bytes) -> np.ndarray:
    if payload[:4] != b"FIMG":
        raise ValueError("not a FIMG payload")
    w, h, c = struct.unpack_from("<HHB", payload, 4)
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * c, offset=9)
    return arr.reshape(h, w, c)


def encode_fake_audio(sample_rate: int, n_samples: int, seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    pcm = (rng.randn(n_samples) * 8192).astype(np.int16)
    return b"FAUD" + struct.pack("<II", sample_rate, n_samples) + pcm.tobytes()


def decode_fake_audio(payload: bytes) -> Tuple[int, np.ndarray]:
    if payload[:4] != b"FAUD":
        raise ValueError("not a FAUD payload")
    sr, n = struct.unpack_from("<II", payload, 4)
    pcm = np.frombuffer(payload, dtype=np.int16, count=n, offset=12)
    return sr, pcm


def encode_fake_video(frames: List[bytes]) -> bytes:
    out = [b"FVID", struct.pack("<H", len(frames))]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def decode_fake_video(payload: bytes) -> List[bytes]:
    if payload[:4] != b"FVID":
        raise ValueError("not a FVID payload")
    (n,) = struct.unpack_from("<H", payload, 4)
    off = 6
    frames = []
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", payload, off)
        off += 4
        frames.append(bytes(payload[off : off + ln]))
        off += ln
    return frames


# ---------------------------------------------------------------------------
# Vectorized kernels (real code — work on any HxWxC / PCM ndarray)
# ---------------------------------------------------------------------------

def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy (no codec needed)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def image_features(img: np.ndarray) -> np.ndarray:
    """Per-channel mean/std + 8-bin global histogram -> float32[2C+8]."""
    means = img.reshape(-1, img.shape[2]).mean(axis=0)
    stds = img.reshape(-1, img.shape[2]).std(axis=0)
    hist, _ = np.histogram(img, bins=8, range=(0, 256))
    hist = hist / max(1, img.size)
    return np.concatenate([means, stds, hist]).astype(np.float32)


def audio_windows_rms(pcm: np.ndarray, window: int = 1024) -> np.ndarray:
    """RMS per non-overlapping window -> float32[n_windows]."""
    n = (len(pcm) // window) * window
    if n == 0:
        return np.zeros(0, dtype=np.float32)
    x = pcm[:n].astype(np.float64).reshape(-1, window)
    return np.sqrt((x * x).mean(axis=1)).astype(np.float32)


# ---------------------------------------------------------------------------
# The actor stage
# ---------------------------------------------------------------------------

class MediaFeatureExtractor:
    """Actor-pool stage: decode -> (resize | window | frame-sample) ->
    feature vector.  Codec handles are probed ONCE per actor in
    __init__ (the model-load amortization slot); per-payload failures
    degrade to decode_ok=False rows (mirroring the reference's
    per-page ("", 0.0) degradation, pass_pdf_ocr_a.py:129-133)."""

    def __init__(self, resize_to: int = 32, audio_window: int = 1024,
                 video_frame_stride: int = 2):
        self.resize_to = resize_to
        self.audio_window = audio_window
        self.video_frame_stride = video_frame_stride
        # Probe for a real codec once per actor; fall back to the fakes.
        try:  # pragma: no cover - PIL absent in this container
            from PIL import Image  # type: ignore

            self._pil = Image
        except Exception:
            self._pil = None

    def _decode_image(self, payload: bytes) -> np.ndarray:
        if payload[:4] == b"FIMG":
            return decode_fake_image(payload)
        if self._pil is not None:  # pragma: no cover
            import io

            return np.asarray(self._pil.open(io.BytesIO(payload)))
        raise NotImplementedError(
            "real image codec unavailable in this environment (no PIL); "
            "only FIMG fake payloads are decodable"
        )

    def _one(self, media_id: int, kind: str, payload: bytes) -> dict:
        base = {
            "media_id": media_id,
            "kind": kind,
            "decode_ok": True,
            "error": "",
            "width": 0,
            "height": 0,
            "channels": 0,
            "sample_rate": 0,
            "n_units": 1,
            "features": [],
        }
        try:
            if kind == "image":
                img = self._decode_image(payload)
                base["height"], base["width"] = img.shape[0], img.shape[1]
                base["channels"] = img.shape[2] if img.ndim == 3 else 1
                small = resize_nearest(img, self.resize_to, self.resize_to)
                base["features"] = image_features(small).tolist()
            elif kind == "audio":
                sr, pcm = decode_fake_audio(payload)
                base["sample_rate"] = int(sr)
                rms = audio_windows_rms(pcm, self.audio_window)
                base["n_units"] = int(len(rms))
                base["features"] = rms[:64].tolist()
            elif kind == "video":
                frames = decode_fake_video(payload)
                sampled = frames[:: self.video_frame_stride]
                base["n_units"] = len(sampled)
                feats = []
                for f in sampled:
                    img = self._decode_image(f)
                    if not base["width"]:
                        base["height"], base["width"] = img.shape[0], img.shape[1]
                        base["channels"] = img.shape[2] if img.ndim == 3 else 1
                    small = resize_nearest(img, self.resize_to, self.resize_to)
                    feats.append(image_features(small))
                base["features"] = (
                    np.mean(feats, axis=0).astype(np.float32).tolist() if feats else []
                )
            else:
                raise ValueError(f"unknown media kind {kind!r}")
        except Exception as e:
            base["decode_ok"] = False
            base["error"] = f"{type(e).__name__}: {e}"
            base["features"] = []
        return base

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = [
            self._one(mid, kind, payload or b"")
            for mid, kind, payload in zip(
                t["media_id"].to_pylist(),
                t["kind"].to_pylist(),
                t["payload"].to_pylist(),
            )
        ]
        cols = {}
        for fld in FEATURES_SCHEMA:
            cols[fld.name] = pa.array([r[fld.name] for r in rows], type=fld.type)
        return pa.table(cols, schema=FEATURES_SCHEMA)


def extract_media_features(
    ds: "ray.data.Dataset",
    resize_to: int = 32,
    concurrency=2,
    batch_size: int = 64,  # binary payloads are wide: small batches
) -> "ray.data.Dataset":
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"resize_to": resize_to},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# Deterministic media corpus + the queries() entry
# ---------------------------------------------------------------------------

def make_media_table(n_rows: int, seed: int = 42) -> pa.Table:
    ids, kinds, payloads = [], [], []
    for i in range(n_rows):
        ids.append(i)
        which = i % 3
        if which == 0:
            kinds.append("image")
            payloads.append(encode_fake_image(32 + (i % 5) * 16, 24 + (i % 3) * 8, 3, seed + i))
        elif which == 1:
            kinds.append("audio")
            payloads.append(encode_fake_audio(16000, 4096 + (i % 4) * 1024, seed + i))
        else:
            kinds.append("video")
            frames = [
                encode_fake_image(32, 24, 3, seed + i * 10 + k) for k in range(2 + i % 4)
            ]
            payloads.append(encode_fake_video(frames))
    # a corrupt payload exercises the decode_ok=False path
    if n_rows > 3:
        payloads[3] = b"JUNK" + payloads[3][4:]
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        },
        schema=MEDIA_SCHEMA,
    )


def _media_path(sf_dir: str) -> str:
    """Deterministic media corpus scaled like the documents table,
    cached in /tmp."""
    import os

    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    n = max(100, n_docs // 2)
    path = f"/tmp/docray_media_n{n}_s42.parquet"
    if not os.path.exists(path):
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(make_media_table(n, seed=42), tmp)
        os.replace(tmp, path)
    return path


def media_features(sf_dir: str):
    """queries() entry: features over a deterministic media corpus
    scaled like the documents table (rows-only check; no SQL oracle for
    binary decode)."""
    from document_extractor_ray.sources import read_parquet_clean

    ds = read_parquet_clean(_media_path(sf_dir))
    return extract_media_features(ds).sort("media_id")


# ---------------------------------------------------------------------------
# Video frame sampling: explode each video into even-spaced frames
# ---------------------------------------------------------------------------

FRAME_SAMPLE_TARGET = 3
FRAME_RESIZE = 16

FRAME_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("frame_idx", pa.int64()),   # 1-based index into the source video
        ("width", pa.int64()),       # decoded frame dims (pre-resize)
        ("height", pa.int64()),
        ("pixel_sum", pa.int64()),   # exact int sum over the resized frame
        ("decode_ok", pa.bool_()),
        ("error", pa.string()),
    ]
)


class FrameSampler:
    """Actor-pool stage: video payload -> even-spaced frame sample ->
    per-frame resize + exact integer pixel sum, ONE OUTPUT ROW PER
    SAMPLED FRAME (the explode happens inside the batch, so a 10k-frame
    video never materializes as Python rows outside the actor).  Frame
    picks reuse the reference's deterministic even-spaced sampler
    (core/scoring.sample_page_indices, the E4/O4 quirk mirror —
    /root/reference/scripts/common.py:352-371), tying the multimodal
    path to the same pinned sampling semantics as page triage.
    Corrupt payloads degrade to one decode_ok=False row."""

    def __init__(self, target: int = FRAME_SAMPLE_TARGET,
                 resize_to: int = FRAME_RESIZE):
        from document_extractor_ray.core.scoring import sample_page_indices

        self.target = target
        self.resize_to = resize_to
        self._sample = sample_page_indices

    def _rows(self, media_id: int, payload: bytes):
        try:
            frames = decode_fake_video(payload or b"")
            picks = self._sample(len(frames), self.target)
            out = []
            for i in picks:
                img = decode_fake_image(frames[i - 1])
                small = resize_nearest(img, self.resize_to, self.resize_to)
                out.append(
                    {
                        "media_id": media_id,
                        "frame_idx": i,
                        "width": int(img.shape[1]),
                        "height": int(img.shape[0]),
                        "pixel_sum": int(small.astype(np.int64).sum()),
                        "decode_ok": True,
                        "error": "",
                    }
                )
            return out
        except Exception as e:
            return [
                {
                    "media_id": media_id,
                    "frame_idx": 0,
                    "width": 0,
                    "height": 0,
                    "pixel_sum": 0,
                    "decode_ok": False,
                    "error": f"{type(e).__name__}: {e}",
                }
            ]

    def __call__(self, t: pa.Table) -> pa.Table:
        keep = t.filter(pa.compute.equal(t["kind"], "video"))
        rows = []
        for mid, payload in zip(
            keep["media_id"].to_pylist(), keep["payload"].to_pylist()
        ):
            rows.extend(self._rows(mid, payload))
        cols = {
            fld.name: pa.array([r[fld.name] for r in rows], type=fld.type)
            for fld in FRAME_SCHEMA
        }
        return pa.table(cols, schema=FRAME_SCHEMA)


def frame_sample(sf_dir: str):
    """queries() entry: even-spaced frame sampling over the video rows
    of the deterministic media corpus (golden-pinned; binary decode has
    no SQL oracle).  Output ordered (media_id, frame_idx)."""
    from document_extractor_ray.sources import read_parquet_clean

    ds = read_parquet_clean(_media_path(sf_dir))
    return ds.map_batches(
        FrameSampler,
        batch_format="pyarrow",
        concurrency=2,
        batch_size=64,
        num_cpus=1,
    ).sort(["media_id", "frame_idx"])


# ---------------------------------------------------------------------------
# Exact media dedup by content hash (binary-payload dedup)
# ---------------------------------------------------------------------------

def media_dup_groups(ds: "ray.data.Dataset"):
    """Exact duplicate detection over opaque binary payloads: content
    hash = the shuffle layer's vectorized 64-bit FNV over the Arrow
    binary buffers (zero per-row Python), grouped; emits one row per
    duplicated (hash, kind) group with member count and the minimal
    media_id as the keeper — the media twin of dedup_exact.  Scale
    shape: hashing is per-batch buffer arithmetic, the exchange
    carries (hash, kind, id) triples (never payloads), and the group
    fold is a bucketed min/count aggregate."""
    import pyarrow.compute as pc

    from document_extractor_ray.functions.bucketing import _bytes_hash_u64, bucketed_agg

    def slim(t: pa.Table) -> pa.Table:
        h = _bytes_hash_u64(t["payload"].combine_chunks()).view(np.int64)
        return pa.table(
            {
                "content_hash": pa.array(h, pa.int64()),
                "kind": t["kind"],
                "media_id": t["media_id"],
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )

    grouped = bucketed_agg(
        ds.map_batches(slim, batch_format="pyarrow"),
        ["content_hash", "kind"],
        [("media_id", "min", "keeper_id"), ("one", "sum", "n_copies")],
    )

    def dups_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["n_copies"], 1)).select(
            ["content_hash", "kind", "keeper_id", "n_copies"]
        )

    return grouped.map_batches(dups_only, batch_format="pyarrow").sort(
        ["kind", "keeper_id"]
    )


def media_dup_groups_table(sf_dir: str):
    """Query entry: the synthesized media table with PLANTED exact
    duplicates (every payload at id % 7 == 0 repeats at id+1) so the
    dedup has ground truth; rows-only driver check, golden-pinned in
    pytest."""
    import ray.data

    t = make_media_table(60, seed=42)
    payloads = t["payload"].to_pylist()
    for i in range(0, len(payloads) - 1, 7):
        payloads[i + 1] = payloads[i]
    planted = pa.table(
        {
            "media_id": t["media_id"],
            "kind": pa.array(
                [t["kind"][i].as_py() if (i % 7) != 1 else t["kind"][i - 1].as_py()
                 for i in range(len(payloads))],
                pa.string(),
            ),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    return media_dup_groups(ray.data.from_arrow(planted))
