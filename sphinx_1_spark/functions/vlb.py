"""Sphinx VLB (variable-length byte) codec, numpy-vectorized.

Format (reference `CSphWriter::ZipInt`/`ZipOffset`
src/sphinx.cpp:5622-5655; spec doc/internals-index-format.txt:45-65):
7 data bits per byte, **high bits first**, bit 0x80 set on every byte
except the last.  0x37 -> [0x37]; 0x12345 -> [0x84, 0xC6, 0x45].

Monotone sequences (docids, positions, offsets) are delta-encoded
before zipping; zero terminates reference lists, so callers encode
deltas that are guaranteed nonzero and length-prefix instead where a
sequence legitimately contains zeros (tf, fieldmask values).

encode/decode operate on whole uint64 arrays with no per-element
Python: byte counts via log2-style bit_length, scatter via cumsum
offsets.
"""

from __future__ import annotations

import numpy as np


def vlb_encode_with_sizes(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode a uint64 array; also return per-value byte counts so
    callers can slice the stream at value boundaries (block splits)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    buf, nbytes = _vlb_encode_core(v)
    return buf, nbytes


def vlb_encode(values: np.ndarray) -> bytes:
    """Encode a uint64 array to concatenated VLB bytes."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    return _vlb_encode_core(v)[0]


def _vlb_encode_core(v: np.ndarray) -> tuple[bytes, np.ndarray]:
    # bytes needed = ceil(bit_length / 7), min 1 — computed as
    # 1 + (number of 7-bit-group thresholds the value reaches): at
    # most 9 vectorized compares, early-exit when none reach (the old
    # per-bit while loop made one masked pass per BIT, ~40 for docid
    # deltas; this cut the whole encode stage ~4x, see BENCH.md)
    nbytes = np.ones(v.shape, dtype=np.int64)
    for shift in range(7, 64, 7):
        m = v >= (np.uint64(1) << np.uint64(shift))
        if not m.any():
            break
        nbytes += m
    total = int(nbytes.sum())
    if total == v.size:
        # every value < 128: the stream IS the values (tf / fieldmask
        # streams land here almost always)
        return v.astype(np.uint8).tobytes(), nbytes
    out = np.empty(total, dtype=np.uint8)
    # positions of each value's LAST byte; write it for all values,
    # then fill higher groups only for the (compacted) multi-byte tail
    ends = np.cumsum(nbytes) - 1
    out[ends] = (v & np.uint64(0x7F)).astype(np.uint8)
    active = np.flatnonzero(nbytes > 1)
    shifted = v[active] >> np.uint64(7)
    k = 1
    while active.size:
        out[ends[active] - k] = (
            (shifted & np.uint64(0x7F)) | np.uint64(0x80)
        ).astype(np.uint8)
        keep = nbytes[active] > k + 1
        active = active[keep]
        shifted = shifted[keep] >> np.uint64(7)
        k += 1
    return out.tobytes(), nbytes


def vlb_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode concatenated VLB bytes back to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    if not is_last[-1]:
        raise ValueError("truncated VLB stream (ends on a continuation byte)")
    nvals = int(is_last.sum())
    data = (b & 0x7F).astype(np.uint64)
    # accumulate high-bits-first: out = out*128 + byte, grouped by val_idx
    # loop over byte-position-within-value (max 10 for 64-bit)
    starts = np.flatnonzero(np.concatenate(([True], is_last[:-1])))
    lengths = np.diff(np.concatenate((starts, [b.size])))
    # first (highest) byte group for every value, then accumulate
    # lower groups over a compacted multi-byte tail (same shape as the
    # encode: 1-byte values — the vast majority — take one pass)
    out = data[starts].copy()
    active = np.flatnonzero(lengths > 1)
    alens = lengths[active]
    k = 1
    while active.size:
        out[active] = (out[active] << np.uint64(7)) | data[starts[active] + k]
        keep = alens > k + 1
        active = active[keep]
        alens = alens[keep]
        k += 1
    if count is not None and nvals != count:
        raise ValueError(f"expected {count} values, decoded {nvals}")
    return out


def delta_encode(sorted_vals: np.ndarray, infinum: int = 0) -> np.ndarray:
    """Deltas of a strictly-increasing sequence starting from infinum
    (docid deltas start at min-docid-1, src/sphinx.cpp:9767-9772) —
    all deltas >= 1, so 0 stays free as a terminator."""
    v = np.asarray(sorted_vals, dtype=np.uint64)
    out = np.empty_like(v)
    if v.size:
        out[0] = v[0] - np.uint64(infinum)
        np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(deltas: np.ndarray, infinum: int = 0) -> np.ndarray:
    d = np.asarray(deltas, dtype=np.uint64)
    return np.cumsum(d, dtype=np.uint64) + np.uint64(infinum)
