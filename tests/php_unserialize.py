"""Minimal PHP `serialize()` reader — enough to load the reference
test harness goldens (`/root/reference/test/test_NN/model.bin`, written
by ubertest.php).  Supports the types the harness emits: arrays,
strings (byte counted), ints, floats, bools, null.

Strings are returned as `str` decoded latin-1-safe: the harness stores
raw bytes with a byte length, so we decode utf-8 with a latin-1
fallback per string.
"""

from __future__ import annotations


def loads(data: bytes):
    val, pos = _parse(data, 0)
    return val


def _decode(b: bytes) -> str:
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return b.decode("latin-1")


def _parse(d: bytes, i: int):
    t = d[i:i + 1]
    if t == b"N":
        assert d[i:i + 2] == b"N;"
        return None, i + 2
    if t == b"b":
        j = d.index(b";", i)
        return d[i + 2:j] == b"1", j + 1
    if t == b"i":
        j = d.index(b";", i)
        return int(d[i + 2:j]), j + 1
    if t == b"d":
        j = d.index(b";", i)
        return float(d[i + 2:j]), j + 1
    if t == b"s":
        j = d.index(b":", i + 2)
        n = int(d[i + 2:j])
        start = j + 2  # skip :"
        s = d[start:start + n]
        assert d[start + n:start + n + 2] == b'";', d[start + n:start + n + 8]
        return _decode(s), start + n + 2
    if t == b"a":
        j = d.index(b":", i + 2)
        n = int(d[i + 2:j])
        pos = j + 2  # skip :{
        out = {}
        for _ in range(n):
            k, pos = _parse(d, pos)
            v, pos = _parse(d, pos)
            out[k] = v
        assert d[pos:pos + 1] == b"}"
        # dense int-keyed arrays -> list
        if out and all(isinstance(k, int) for k in out) and sorted(out) == list(
            range(len(out))
        ):
            return [out[k] for k in range(len(out))], pos + 1
        return out, pos + 1
    raise ValueError(f"unsupported php type {t!r} at {i}")
