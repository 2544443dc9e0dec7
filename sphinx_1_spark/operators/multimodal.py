"""Multimodal column plumbing: opaque binary payloads + typed
metadata, decoded/feature-extracted via Arrow-batched mapInPandas.

Image/audio/video payloads are `binary` columns.  The decode step is
pluggable behind `decoder=`:
  * "fake" — deterministic pseudo-decoder (metadata and features are
    pure functions of the bytes via md5) so the Spark-side plumbing
    (schemas, batching, partitioning, UDF signatures) is fully
    testable without codec libraries;
  * "png"  — a REAL codec with zero dependencies beyond the stdlib:
    IHDR header parse for metadata, zlib-inflate + scanline unfilter
    (numpy) for pixel features.  Proves the mapInPandas seam with
    actual image bytes in this container;
  * "pil"  — Pillow-backed decode for every format PIL reads; optional
    import, raises NotImplementedError when Pillow is absent;
  * video frame extraction ("ffmpeg") remains an explicit
    NotImplementedError hook.

At scale: payload columns should live in their own parquet files
(Iceberg column projection keeps metadata-only queries from touching
bytes), batches stay bounded by `spark.sql.execution.arrow.
maxRecordsPerBatch`, and partitioning follows the storage layout —
these operators add no shuffle.
"""

from __future__ import annotations

import hashlib
import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
        StructField("n_bytes", IntegerType()),
    ]
)

FEATURE_DIM = 8
# double, not float: float32 storage would truncate the rounded values
# the exact-compare oracle checks
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)

_FORMATS = ("jpeg", "png", "webp", "gif")


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for an image header parse."""
    h = hashlib.md5(payload).digest()
    w = 64 + (h[0] | (h[1] << 8)) % 1985
    ht = 64 + (h[2] | (h[3] << 8)) % 1985
    fmt = _FORMATS[h[4] % len(_FORMATS)]
    return w, ht, fmt


def _fake_features(payload: bytes) -> list[float]:
    h = hashlib.md5(b"feat:" + payload).digest()
    return [
        struct.unpack("<H", h[2 * i : 2 * i + 2])[0] / 65535.0
        for i in range(FEATURE_DIM)
    ]


# ------------------------------------------------------------------ png
# Minimal PNG codec (stdlib zlib + numpy): 8-bit depth, color types
# 0/2/4/6, no interlace — the common case for web thumbnails.  This is
# the "real decoder" seam exercised in-container; PIL plugs into the
# same registry for full format coverage.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_ihdr(payload: bytes) -> tuple[int, int, int, int, int]:
    """(width, height, bitdepth, colortype, interlace) from IHDR."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    # first chunk must be IHDR: len(4) type(4) data(13)
    if len(payload) < 29:
        # keep the descriptive-ValueError contract for truncated files
        # (struct.unpack below would raise struct.error otherwise)
        raise ValueError("corrupt PNG (truncated before IHDR)")
    if payload[12:16] != b"IHDR":
        raise ValueError("not a PNG (missing IHDR)")
    w, h = struct.unpack(">II", payload[16:24])
    depth, ctype, _comp, _filt, interlace = struct.unpack(
        "BBBBB", payload[24:29]
    )
    return w, h, depth, ctype, interlace


def _png_pixels(payload: bytes):
    """Decode to an (H, W, C) uint8 array.  Supports bit depth 8,
    color types 0/2/4/6, interlace 0 (PNG spec §4.5-4.6; filters
    None/Sub/Up/Average/Paeth per §6)."""
    import zlib

    import numpy as np

    w, h, depth, ctype, interlace = _png_ihdr(payload)
    if depth != 8 or interlace != 0 or ctype not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={ctype}, "
            f"interlace={interlace}) — use decoder='pil'"
        )
    ch = _PNG_CHANNELS[ctype]
    # walk chunks, concatenate IDAT
    idat = bytearray()
    i = 8
    while i + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[i : i + 4])
        typ = payload[i + 4 : i + 8]
        if typ == b"IDAT":
            idat += payload[i + 8 : i + 8 + ln]
        elif typ == b"IEND":
            break
        i += 12 + ln  # len + type + data + crc
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG (bad decompressed length)")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = arr[:, 0]
    data = arr[:, 1:].astype(np.int32)
    out = np.zeros_like(data)
    for y in range(h):
        f = filters[y]
        line = data[y]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int32)
        if f == 0:
            out[y] = line
        elif f == 1:  # Sub: per-channel prefix sum mod 256
            lane = line.reshape(w, ch).astype(np.int64)
            out[y] = (np.cumsum(lane, axis=0) & 0xFF).reshape(stride)
        elif f == 2:  # Up
            out[y] = (line + prev) & 0xFF
        elif f == 3:  # Average
            # left-recon recurrence is sequential, so this row can't
            # vectorize — but looping over PYTHON LISTS beats ndarray
            # scalar indexing ~12x (each arr[x] boxes an int32;
            # list[x] is a pointer read).  Same trick for Paeth (7x).
            cur = line.tolist()
            pr = prev.tolist()
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (cur[x] + ((left + pr[x]) >> 1)) & 0xFF
            out[y] = cur
        elif f == 4:  # Paeth
            cur = line.tolist()
            pr = prev.tolist()
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = pr[x]
                c = pr[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
            out[y] = cur
        else:
            raise ValueError(f"bad PNG filter {f}")
    return out.astype(np.uint8).reshape(h, w, ch)


def _png_decode_meta(payload: bytes) -> tuple[int, int, str]:
    w, h, _d, _c, _i = _png_ihdr(payload)
    return w, h, "png"


def _rgb_stats(rgb) -> list[float]:
    """FEATURE_DIM stats in [0,1] from an (H, W, 3) float array in
    [0,1]: per-channel means and stds, aspect ratio w/(w+h), mean
    luma.  ONE definition shared by every real decoder — the pil/png
    agreement test pins them together."""
    h, w = rgb.shape[:2]
    means = rgb.mean(axis=(0, 1))
    stds = rgb.std(axis=(0, 1))
    luma = float(
        (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2])
        .mean()
    )
    feats = [*means.tolist(), *stds.tolist(), w / (w + h), luma]
    return [round(float(v), 9) for v in feats]


def _png_features(payload: bytes) -> list[float]:
    import numpy as np

    px = _png_pixels(payload).astype(np.float64) / 255.0
    ch = px.shape[2]
    rgb = px[:, :, :3] if ch >= 3 else np.repeat(px[:, :, :1], 3, axis=2)
    return _rgb_stats(rgb)


def _png_encode(arr) -> bytes:
    """Encode an (H, W, C) uint8 array as a PNG (filter 0 scanlines) —
    the write half of the stdlib codec, used by resize_images and the
    test fixtures."""
    import zlib

    h, w, ch = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _png_resize(payload: bytes, w: int, h: int) -> bytes:
    """Nearest-neighbor resample via numpy fancy-indexing, re-encoded
    as PNG.  (Bilinear/Lanczos belong to the 'pil' decoder.)"""
    import numpy as np

    px = _png_pixels(payload)
    sh, sw = px.shape[:2]
    ys = np.minimum((np.arange(h) * sh) // h, sh - 1)
    xs = np.minimum((np.arange(w) * sw) // w, sw - 1)
    return _png_encode(px[ys][:, xs])


def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic stand-in: payload bytes tiled/truncated to w*h."""
    if not payload:
        payload = b"\x00"
    need = w * h
    rep = payload * (need // len(payload) + 1)
    return rep[:need]


# ------------------------------------------------------------------ pil


def _pil_image(payload: bytes):
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - PIL absent here
        raise NotImplementedError(
            "decoder 'pil' needs Pillow on the executors "
            "(pip install pillow); the stdlib 'png' decoder covers "
            "8-bit non-interlaced PNG without it"
        ) from e
    import io

    return Image.open(io.BytesIO(payload))


def _pil_decode_meta(payload: bytes) -> tuple[int, int, str]:
    img = _pil_image(payload)
    return img.width, img.height, (img.format or "unknown").lower()


def _pil_features(payload: bytes) -> list[float]:
    import numpy as np

    img = _pil_image(payload).convert("RGB")
    rgb = np.asarray(img, dtype=np.float64) / 255.0
    return _rgb_stats(rgb)


def _pil_resize(payload: bytes, w: int, h: int) -> bytes:
    import io

    img = _pil_image(payload)
    out = io.BytesIO()
    img.resize((w, h)).save(out, format=img.format or "PNG")
    return out.getvalue()


# decoder registry: name -> (meta_fn, feature_fn, resize_fn); all take
# bytes (resize also takes target w, h)
_DECODERS = {
    "fake": (_fake_decode, _fake_features, _fake_resize),
    "png": (_png_decode_meta, _png_features, _png_resize),
    "pil": (_pil_decode_meta, _pil_features, _pil_resize),
}


def _decoder(decoder: str):
    if decoder not in _DECODERS:
        raise NotImplementedError(
            f"decoder {decoder!r}: known decoders are {sorted(_DECODERS)}; "
            "plug new codecs into _DECODERS (bytes -> meta/features)"
        )
    if decoder == "pil":
        # probe on the DRIVER so a missing Pillow fails fast with the
        # integration message instead of surfacing as a wrapped
        # executor PythonException mid-job
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "decoder 'pil' needs Pillow on driver and executors "
                "(pip install pillow); the stdlib 'png' decoder covers "
                "8-bit non-interlaced PNG without it"
            ) from e
    return _DECODERS[decoder]


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Test-fixture helper: synthesize a binary payload column from
    text (stands in for a real image-bytes column)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def decode_image_metadata(
    df: DataFrame, payload_col: str = "payload", decoder: str = "fake"
) -> DataFrame:
    """binary payload -> (doc_id, width, height, format, n_bytes)."""
    meta_fn = _decoder(decoder)[0]

    proj = df.select("doc_id", payload_col)

    def gen(batches):
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "width", "height", "format", "n_bytes")}
            for did, payload in zip(pdf["doc_id"], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                w, h, fmt = meta_fn(b)
                rows["doc_id"].append(int(did))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["format"].append(fmt)
                rows["n_bytes"].append(len(b))
            yield pd.DataFrame(rows)

    return proj.mapInPandas(gen, IMAGE_META_SCHEMA)


def extract_features(
    df: DataFrame, payload_col: str = "payload", decoder: str = "fake"
) -> DataFrame:
    """binary payload -> (doc_id, features: array<double>[8])."""
    feat_fn = _decoder(decoder)[1]

    proj = df.select("doc_id", payload_col)

    def gen(batches):
        for pdf in batches:
            dids, feats = [], []
            for did, payload in zip(pdf["doc_id"], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                dids.append(int(did))
                feats.append(feat_fn(b))
            yield pd.DataFrame({"doc_id": dids, "features": feats})

    return proj.mapInPandas(gen, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    decoder: str = "fake",
) -> DataFrame:
    """binary payload -> (doc_id, payload: resized binary, width,
    height).  The thumbnail/normalize step of a multimodal training
    pipeline; 'png' does a real nearest-neighbor resample + re-encode,
    'pil' uses Pillow's resampling, 'fake' is deterministic filler.
    Arrow-batched mapInPandas, no shuffle."""
    resize_fn = _decoder(decoder)[2]

    proj = df.select("doc_id", payload_col)

    def gen(batches):
        for pdf in batches:
            dids, outs = [], []
            for did, payload in zip(pdf["doc_id"], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                dids.append(int(did))
                outs.append(resize_fn(b, width, height))
            yield pd.DataFrame(
                {
                    "doc_id": dids,
                    "payload": outs,
                    "width": [width] * len(dids),
                    "height": [height] * len(dids),
                }
            )

    return proj.mapInPandas(gen, RESIZED_SCHEMA)


def _fake_frames(payload: bytes, n_frames: int) -> list[bytes]:
    """Deterministic payload slicing — the gate-checked plumbing path."""
    step = max(1, len(payload) // n_frames)
    return [payload[i * step : (i + 1) * step] for i in range(n_frames)]


def _pyav_frames(payload: bytes, n_frames: int) -> list[bytes]:
    """Real keyframe sampling via PyAV (ffmpeg bindings): decode the
    container from bytes, take n_frames evenly spaced frames, return
    each re-encoded as PNG.  Import guarded by _video_decoder's
    driver-side probe."""
    import io

    import av

    if not payload:
        # NULL/empty payload: zero frames — one missing video must not
        # abort the whole job with av's raw InvalidDataError from deep
        # inside a task.  (The fake decoder instead emits n_frames
        # empty slices for an empty payload; the oracle mirrors that,
        # so the fake contract stays as-is.)
        return []
    try:
        container = av.open(io.BytesIO(payload))
    except OSError as exc:
        # PyAV's FFmpegError (InvalidDataError etc.) subclasses
        # OSError in every released version — rewrap with the seam's
        # descriptive-error contract
        raise ValueError(f"cannot decode video container: {exc}") from exc
    with container:
        if not container.streams.video:
            # descriptive error like _wav_parse/_png_pixels, not a raw
            # IndexError killing the executor task
            raise ValueError("no video stream in container")
        stream = container.streams.video[0]
        total = stream.frames or 0
        if total:
            want = sorted(
                {min(total - 1, i * total // n_frames) for i in range(n_frames)}
            )
        else:
            want = None  # unknown frame count: take the first n_frames
        out: list[bytes] = []
        for i, frame in enumerate(container.decode(stream)):
            if want is not None and i not in want:
                continue
            buf = io.BytesIO()
            frame.to_image().save(buf, format="PNG")
            out.append(buf.getvalue())
            if len(out) >= n_frames:
                break
    return out


_VIDEO_DECODERS = {
    "fake": _fake_frames,
    "pyav": _pyav_frames,
}


def _video_decoder(decoder: str):
    if decoder not in _VIDEO_DECODERS:
        raise NotImplementedError(
            f"video decoder {decoder!r}: known are "
            f"{sorted(_VIDEO_DECODERS)}; plug new codecs into "
            "_VIDEO_DECODERS (bytes, n_frames -> list[frame bytes])"
        )
    if decoder == "pyav":
        # driver-side probe, same pattern as _decoder('pil'): a
        # missing lib fails fast with the integration message instead
        # of a wrapped executor PythonException mid-job
        try:
            import av  # noqa: F401
            import PIL  # noqa: F401  (frame -> PNG re-encode)
        except ImportError as e:
            raise NotImplementedError(
                "video decoder 'pyav' needs PyAV + Pillow on driver and "
                "executors (pip install av pillow); the 'fake' decoder "
                "covers the plumbing without them"
            ) from e
    return _VIDEO_DECODERS[decoder]


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    n_frames: int = 4,
    decoder: str = "fake",
) -> DataFrame:
    """video payload -> one row per sampled frame
    (doc_id, frame_idx, frame: binary) — the explode-shaped op a video
    pipeline needs.  'fake' slices the payload deterministically (the
    oracle-checked plumbing path); 'pyav' decodes real containers via
    ffmpeg and emits PNG frames."""
    frames_fn = _video_decoder(decoder)

    proj = df.select("doc_id", payload_col)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame": []}
            for did, payload in zip(pdf["doc_id"], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                for i, fr in enumerate(frames_fn(b, n_frames)):
                    rows["doc_id"].append(int(did))
                    rows["frame_idx"].append(i)
                    rows["frame"].append(fr)
            yield pd.DataFrame(rows)

    return proj.mapInPandas(gen, schema)


# ------------------------------------------------------------------ audio
# WAV is the audio analog of the PNG path: a REAL container format
# parsed with the stdlib (RIFF chunk walk + numpy PCM math), proving
# the audio plumbing in-container; torchaudio/ffmpeg plug in the same
# two slots for compressed formats.

AUDIO_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("bits", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

# (rms, zero-crossing rate, peak, dc offset) per clip, doubles in [0,1]
AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def _wav_parse(payload: bytes):
    """(sample_rate, channels, bits, pcm_bytes) from a RIFF/WAVE
    container (PCM format 1 only; compressed WAV → 'torchaudio')."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(payload):
        typ = payload[i : i + 4]
        (ln,) = struct.unpack("<I", payload[i + 4 : i + 8])
        body = payload[i + 8 : i + 8 + ln]
        if typ == b"fmt ":
            fmt = body
        elif typ == b"data":
            data = body
        i += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("corrupt WAV (missing fmt/data chunk)")
    if len(fmt) < 16:
        # descriptive-ValueError contract: a truncated fmt chunk would
        # otherwise surface as struct.error from the unpacks below
        raise ValueError("corrupt WAV (fmt chunk shorter than 16 bytes)")
    audio_fmt, ch, rate = struct.unpack("<HHI", fmt[:8])
    bits = struct.unpack("<H", fmt[14:16])[0]
    if audio_fmt != 1 or bits not in (8, 16):
        raise ValueError(
            f"unsupported WAV (format={audio_fmt}, bits={bits}) — "
            "plug torchaudio/ffmpeg into the registry for compressed audio"
        )
    if rate == 0 or ch == 0:
        # zero values here turn into ZeroDivisionError in the duration
        # and per-sample math downstream
        raise ValueError("corrupt WAV (zero sample rate or channel count)")
    return rate, ch, bits, data


def _wav_meta(payload: bytes):
    rate, ch, bits, data = _wav_parse(payload)
    n = len(data) // (ch * (bits // 8))
    return rate, ch, bits, n, (n * 1000) // rate


def _wav_samples(payload: bytes):
    """(n_samples, channels) float64 in [-1, 1]."""
    import numpy as np

    rate, ch, bits, data = _wav_parse(payload)
    if bits == 16:
        arr = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    else:  # 8-bit WAV is unsigned
        arr = (
            np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    return arr.reshape(-1, ch), rate


def _wav_features(payload: bytes) -> list[float]:
    x, _rate = _wav_samples(payload)
    # shared feature math (empty data chunk -> all-zero, never NaN)
    return _audio_feature_vec(x.mean(axis=1))


def _fake_audio_meta(payload: bytes):
    h = hashlib.md5(b"aud:" + payload).digest()
    rate = (8000, 16000, 22050, 44100)[h[0] % 4]
    ch = 1 + h[1] % 2
    n = 1000 + (h[2] | (h[3] << 8))
    return rate, ch, 16, n, (n * 1000) // rate


def _fake_audio_features(payload: bytes) -> list[float]:
    h = hashlib.md5(b"audfeat:" + payload).digest()
    return [
        struct.unpack("<H", h[2 * i : 2 * i + 2])[0] / 65535.0
        for i in range(4)
    ]


def _audio_feature_vec(mono) -> list[float]:
    """Shared (rms, zcr, peak, dc) math over a mono float64 array in
    [-1, 1] — one definition for the wav and torchaudio decoders."""
    import numpy as np

    if not len(mono):
        return [0.0, 0.0, 0.0, 0.0]
    rms = float(np.sqrt((mono * mono).mean()))
    zcr = (
        float((np.signbit(mono[1:]) != np.signbit(mono[:-1])).mean())
        if len(mono) > 1
        else 0.0
    )
    peak = float(np.abs(mono).max())
    dc = float(abs(mono.mean()))
    return [round(v, 9) for v in (rms, zcr, peak, dc)]


def _torchaudio_load(payload: bytes):
    """(samples ndarray (n, ch) float64 in [-1,1], rate, bits) via
    torchaudio — covers compressed formats (mp3/flac/ogg/...) the
    stdlib WAV parser rejects.  Import guarded by _audio_decoder's
    driver-side probe."""
    import io

    import torchaudio

    buf = io.BytesIO(payload)
    info = torchaudio.info(buf)
    buf.seek(0)
    wav, rate = torchaudio.load(buf)  # (channels, n) float32 in [-1,1]
    # bits_per_sample is 0 for lossy codecs (no fixed sample width)
    return wav.numpy().T.astype("float64"), int(rate), int(
        getattr(info, "bits_per_sample", 0) or 0
    )


def _torchaudio_meta(payload: bytes):
    x, rate, bits = _torchaudio_load(payload)
    n, ch = x.shape
    return rate, ch, bits, n, (n * 1000) // rate


def _torchaudio_features(payload: bytes) -> list[float]:
    x, _rate, _bits = _torchaudio_load(payload)
    return _audio_feature_vec(x.mean(axis=1))


_AUDIO_DECODERS = {
    "fake": (_fake_audio_meta, _fake_audio_features),
    "wav": (_wav_meta, _wav_features),
    "torchaudio": (_torchaudio_meta, _torchaudio_features),
}


def _audio_decoder(decoder: str):
    if decoder not in _AUDIO_DECODERS:
        raise NotImplementedError(
            f"audio decoder {decoder!r}: known are "
            f"{sorted(_AUDIO_DECODERS)}; plug new codecs into "
            "_AUDIO_DECODERS (bytes -> meta/features)"
        )
    if decoder == "torchaudio":
        # driver-side probe, same pattern as _decoder('pil')
        try:
            import torchaudio  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "audio decoder 'torchaudio' needs torchaudio on driver "
                "and executors (pip install torchaudio); the stdlib "
                "'wav' decoder covers PCM WAV without it"
            ) from e
    return _AUDIO_DECODERS[decoder]


def decode_audio_metadata(
    df: DataFrame, payload_col: str = "payload", decoder: str = "fake"
) -> DataFrame:
    """binary payload -> (doc_id, sample_rate, channels, bits,
    n_samples, duration_ms)."""
    meta_fn = _audio_decoder(decoder)[0]

    proj = df.select("doc_id", payload_col)

    def gen(batches):
        cols = (
            "doc_id sample_rate channels bits n_samples duration_ms".split()
        )
        for pdf in batches:
            rows = {k: [] for k in cols}
            for did, payload in zip(pdf["doc_id"], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                rate, ch, bits, n, ms = meta_fn(b)
                for k, v in zip(cols, (int(did), rate, ch, bits, n, ms)):
                    rows[k].append(v)
            yield pd.DataFrame(rows)

    return proj.mapInPandas(gen, AUDIO_META_SCHEMA)


def extract_audio_features(
    df: DataFrame, payload_col: str = "payload", decoder: str = "fake"
) -> DataFrame:
    """binary payload -> (doc_id, features: [rms, zcr, peak, dc])."""
    feat_fn = _audio_decoder(decoder)[1]

    proj = df.select("doc_id", payload_col)

    def gen(batches):
        for pdf in batches:
            dids, feats = [], []
            for did, payload in zip(pdf["doc_id"], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                dids.append(int(did))
                feats.append(feat_fn(b))
            yield pd.DataFrame({"doc_id": dids, "features": feats})

    return proj.mapInPandas(gen, AUDIO_FEATURE_SCHEMA)
