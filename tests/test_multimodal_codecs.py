"""Real-decoder seam for the multimodal operators (VERDICT r2 item 7):
the same mapInPandas plumbing the fake decoder exercises, driven by an
ACTUAL image codec — the stdlib PNG decoder that ships in-container,
plus the optional Pillow hook (NotImplementedError when absent)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from sphinx_1_spark.operators import multimodal as mm


def encode_png(arr: np.ndarray, filters: list[int] | None = None) -> bytes:
    """Minimal PNG writer for test fixtures: 8-bit gray/RGB/RGBA, no
    interlace; `filters` picks the per-scanline filter type (default
    all 0 = None) with the forward filter applied per spec §6."""
    h, w, ch = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    filters = filters or [0] * h
    stride = w * ch
    flat = arr.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for y in range(h):
        f = filters[y]
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int32)
        line = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            line[x] = (cur[x] - pred) & 0xFF
        raw += bytes([f]) + line.astype(np.uint8).tobytes()

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _gradient(h, w, ch=3, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)


# ----------------------------------------------------------- pure codec


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip_all_channel_counts(ch):
    px = _gradient(5, 4, ch)
    assert np.array_equal(mm._png_pixels(encode_png(px)), px)


def test_png_roundtrip_every_filter_type():
    # one scanline per filter type 0..4 — exercises each unfilter path
    px = _gradient(5, 6, 3, seed=11)
    data = encode_png(px, filters=[0, 1, 2, 3, 4])
    assert np.array_equal(mm._png_pixels(data), px)


def test_png_meta_and_bad_signature():
    w, h, fmt = mm._png_decode_meta(encode_png(_gradient(3, 9)))
    assert (w, h, fmt) == (9, 3, "png")
    with pytest.raises(ValueError, match="signature"):
        mm._png_decode_meta(b"JFIF not a png")


def test_corrupt_containers_raise_valueerror_not_struct_error():
    # the codecs promise descriptive ValueErrors on bad input; truncated
    # or zero-field containers must not leak struct.error /
    # ZeroDivisionError out of an executor task
    with pytest.raises(ValueError, match="truncated"):
        mm._png_decode_meta(mm._PNG_SIG + b"\x00\x00\x00\x0dIHD")
    import struct

    def wav(fmt_body: bytes) -> bytes:
        chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        chunks += b"data" + struct.pack("<I", 4) + b"\x00" * 4
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    with pytest.raises(ValueError, match="fmt chunk"):
        mm._wav_parse(wav(b"\x01\x00\x01\x00"))  # 4-byte fmt chunk
    zero_rate = struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16)
    with pytest.raises(ValueError, match="zero sample rate"):
        mm._wav_parse(wav(zero_rate))
    zero_ch = struct.pack("<HHIIHH", 1, 0, 44100, 88200, 2, 16)
    with pytest.raises(ValueError, match="zero sample rate or channel"):
        mm._wav_parse(wav(zero_ch))


# -------------------------------------------------------- spark operators


def test_decode_image_metadata_png(spark):
    imgs = [
        (1, encode_png(_gradient(3, 9))),
        (2, encode_png(_gradient(16, 2, 4))),
    ]
    df = spark.createDataFrame(imgs, "doc_id long, payload binary")
    got = {
        r["doc_id"]: (r["width"], r["height"], r["format"], r["n_bytes"])
        for r in mm.decode_image_metadata(df, decoder="png").collect()
    }
    assert got[1] == (9, 3, "png", len(imgs[0][1]))
    assert got[2] == (2, 16, "png", len(imgs[1][1]))


def test_extract_features_png_solid_color(spark):
    # solid red 8x4: exact means/stds/luma, aspect = w/(w+h)
    px = np.zeros((4, 8, 3), dtype=np.uint8)
    px[:, :, 0] = 255
    df = spark.createDataFrame(
        [(7, encode_png(px))], "doc_id long, payload binary"
    )
    (row,) = mm.extract_features(df, decoder="png").collect()
    f = row["features"]
    assert f[0] == 1.0 and f[1] == 0.0 and f[2] == 0.0  # means
    assert f[3] == 0.0 and f[4] == 0.0 and f[5] == 0.0  # stds
    assert f[6] == pytest.approx(8 / 12)  # aspect
    assert f[7] == pytest.approx(0.299)  # luma of pure red


# ------------------------------------------------------------- pil seam


def test_pil_decoder_seam():
    """With Pillow installed the 'pil' decoder must agree with the
    stdlib PNG decoder; without it, the hook raises a clear
    NotImplementedError (never an ImportError leak)."""
    payload = encode_png(_gradient(6, 5))
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if has_pil:
        assert mm._pil_decode_meta(payload) == (5, 6, "png")
        assert mm._pil_features(payload) == mm._png_features(payload)
    else:
        with pytest.raises(NotImplementedError, match="Pillow"):
            mm._pil_decode_meta(payload)


def test_unknown_decoder_rejected(spark):
    df = spark.createDataFrame([(1, b"x")], "doc_id long, payload binary")
    with pytest.raises(NotImplementedError, match="known decoders"):
        mm.decode_image_metadata(df, decoder="libvips")


# --------------------------------------------------------------- resize


def test_png_resize_real_pixels(spark):
    """resize_images decoder='png': real decode -> nearest-neighbor
    resample -> PNG re-encode; the output parses and carries the exact
    sampled pixels."""
    src = _gradient(8, 6, 3, seed=3)
    df = spark.createDataFrame(
        [(1, encode_png(src))], "doc_id long, payload binary"
    )
    (row,) = mm.resize_images(df, 3, 4, decoder="png").collect()
    assert (row["width"], row["height"]) == (3, 4)
    out = mm._png_pixels(bytes(row["payload"]))
    assert out.shape == (4, 3, 3)
    # nearest-neighbor mapping: out[y][x] == src[y*8//4][x*6//3]
    for y in range(4):
        for x in range(3):
            assert (out[y, x] == src[(y * 8) // 4, (x * 6) // 3]).all()


def test_resize_upscale_roundtrips(spark):
    src = _gradient(2, 2, 3, seed=5)
    df = spark.createDataFrame(
        [(1, encode_png(src))], "doc_id long, payload binary"
    )
    (row,) = mm.resize_images(df, 4, 4, decoder="png").collect()
    out = mm._png_pixels(bytes(row["payload"]))
    # each source pixel becomes a 2x2 block
    assert (out[0:2, 0:2] == src[0, 0]).all()
    assert (out[2:4, 2:4] == src[1, 1]).all()


def test_fake_resize_deterministic(spark):
    df = spark.createDataFrame(
        [(1, b"abc"), (2, b"abc")], "doc_id long, payload binary"
    )
    rows = mm.resize_images(df, 4, 2, decoder="fake").collect()
    assert bytes(rows[0]["payload"]) == bytes(rows[1]["payload"])
    assert len(bytes(rows[0]["payload"])) == 8


# ---------------------------------------------------------------- audio


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Minimal PCM16 WAV writer for fixtures: samples float in [-1,1],
    shape (n,) mono or (n, ch)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_meta_and_duration(spark):
    sr = 8000
    wav = encode_wav(np.zeros(4000), rate=sr)  # 0.5 s mono
    df = spark.createDataFrame([(1, wav)], "doc_id long, payload binary")
    (r,) = mm.decode_audio_metadata(df, decoder="wav").collect()
    assert (r.sample_rate, r.channels, r.bits) == (sr, 1, 16)
    assert (r.n_samples, r.duration_ms) == (4000, 500)
    with pytest.raises(ValueError, match="RIFF"):
        mm._wav_meta(b"OggS not a wav")


def test_wav_features_sine(spark):
    # full-scale 1 kHz sine @ 16 kHz: rms ~ 1/sqrt(2), zcr ~ 2*f/sr,
    # peak ~ 1, dc ~ 0
    t = np.arange(16000) / 16000.0
    wav = encode_wav(np.sin(2 * np.pi * 1000 * t))
    df = spark.createDataFrame([(1, wav)], "doc_id long, payload binary")
    (r,) = mm.extract_audio_features(df, decoder="wav").collect()
    rms, zcr, peak, dc = r.features
    assert rms == pytest.approx(0.7071, abs=2e-3)
    assert zcr == pytest.approx(2 * 1000 / 16000, abs=2e-3)
    assert peak == pytest.approx(1.0, abs=2e-3)
    assert dc == pytest.approx(0.0, abs=1e-3)


def test_wav_stereo_roundtrip():
    x = np.stack(
        [np.linspace(-1, 1, 100), np.linspace(1, -1, 100)], axis=1
    )
    got, rate = mm._wav_samples(encode_wav(x, rate=22050))
    assert rate == 22050 and got.shape == (100, 2)
    assert np.abs(got - x).max() < 1e-3


def test_unknown_audio_decoder_rejected(spark):
    df = spark.createDataFrame([(1, b"x")], "doc_id long, payload binary")
    with pytest.raises(NotImplementedError, match="torchaudio"):
        mm.decode_audio_metadata(df, decoder="mp3")


# ------------------------------------------- optional video/audio seams


def test_pyav_video_seam():
    """VERDICT r3 #6: with PyAV installed the 'pyav' decoder samples
    real frames as PNGs; without it, the driver-side probe raises the
    integration message (never an ImportError leak mid-job)."""
    try:
        import av  # noqa: F401
        import PIL  # noqa: F401

        has_av = True
    except ImportError:
        has_av = False

    if not has_av:
        with pytest.raises(NotImplementedError, match="PyAV"):
            mm._video_decoder("pyav")
        return

    # encode a tiny 8-frame video in-memory, then sample 4 frames
    import io

    import av

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=4)
        stream.width, stream.height = 16, 16
        stream.pix_fmt = "yuv420p"
        for i in range(8):
            arr = np.full((16, 16, 3), i * 30, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(arr, format="rgb24")
            for pkt in stream.encode(frame):
                container.mux(pkt)
        for pkt in stream.encode():
            container.mux(pkt)
    frames = mm._video_decoder("pyav")(buf.getvalue(), 4)
    assert len(frames) == 4
    for fr in frames:
        assert fr[:8] == b"\x89PNG\r\n\x1a\n"


def test_torchaudio_seam_agrees_with_wav():
    """With torchaudio installed the 'torchaudio' decoder must agree
    with the stdlib WAV parser on a PCM16 fixture (same meta, same
    shared feature math); without it, the probe raises the
    integration message."""
    t = np.arange(8000) / 8000.0
    wav = encode_wav(np.sin(2 * np.pi * 440 * t), rate=8000)
    try:
        import torchaudio  # noqa: F401

        has_ta = True
    except ImportError:
        has_ta = False

    if not has_ta:
        with pytest.raises(NotImplementedError, match="torchaudio"):
            mm._audio_decoder("torchaudio")
        return

    assert mm._torchaudio_meta(wav) == mm._wav_meta(wav)
    got = mm._torchaudio_features(wav)
    want = mm._wav_features(wav)
    assert got == pytest.approx(want, abs=1e-4)


def test_frame_sample_fake_still_deterministic(spark):
    """The registry refactor must not change the gate-checked fake
    path: frames are deterministic payload slices."""
    df = spark.createDataFrame(
        [(1, bytes(range(16)))], "doc_id long, payload binary"
    )
    rows = mm.frame_sample(df, n_frames=4).orderBy("frame_idx").collect()
    assert [bytes(r.frame) for r in rows] == [
        bytes(range(0, 4)), bytes(range(4, 8)),
        bytes(range(8, 12)), bytes(range(12, 16)),
    ]
