#!/usr/bin/env python
"""mkdict — compile a Chinese-segmentation wordlist into the canonical
dictionary file MMSEG loads (the reference's mkdict tool,
src/mkdict.cpp:1-154: wordsfile -> darts double-array .lib).

The reference compiles to a darts binary because its
commonPrefixSearch runs over the mmapped array; our MMSegDict
(sphinx_1_spark/functions/mmseg.py) builds its dispatch tables from
the *text* form at load (cached per worker process), so the compiled
artifact here is the normalized, deduplicated, byte-sorted
``word\\tfreq`` text file — same information as the darts image, same
input grammar:

* key = line up to the first TAB; value = strtol(rest, base 0)
  (mkdict.cpp:59) — so hex ``0x1f``, octal ``017``, junk-tailed
  ``9abc`` and empty values parse exactly like C strtol;
* a line with NO tab keeps the reference's npos+1 wraparound quirk
  (``find('\\t')+1`` overflows to 0): the key is the whole line and
  the value is strtol over the line minus its last character — so a
  bare ``123abc`` line means word "123abc" with frequency 123;
* duplicate words keep the FIRST occurrence (std::map::insert does
  not overwrite);
* entries sort in byte order (the darts build requirement; ltstr
  over std::string, mkdict.cpp:42-47);
* an empty key (blank input line) aborts the build — darts cannot
  hold the zero-length key, the reference dies with "cannot build
  Chinese dictionary".

Usage: mkdict.py wordsfile dictfile     (wordsfile "-" reads stdin)

Output messages mirror the reference's summary (Preparing... / Total
words / File size / successfully created); the darts-specific
compression-ratio line is dropped — a text file has no double-array
occupancy to report.
"""

from __future__ import annotations

import sys


def strtol0(s: bytes) -> int:
    """C strtol(s, NULL, 0): skip leading whitespace, optional sign,
    base auto-detect (0x hex / leading-0 octal / decimal), parse the
    longest valid prefix, 0 when none."""
    i, n = 0, len(s)
    while i < n and s[i : i + 1].isspace():
        i += 1
    sign = 1
    if i < n and s[i] in b"+-":
        sign = -1 if s[i] == ord("-") else 1
        i += 1
    digits = b"0123456789"
    if i + 1 < n and s[i] == ord("0") and s[i + 1] in b"xX":
        # "0x" with no hex digit after it parses as the "0"
        if i + 2 < n and s[i + 2 : i + 3] in b"0123456789abcdefABCDEF":
            i += 2
            digits = b"0123456789abcdefABCDEF"
            base = 16
        else:
            return 0
    elif i < n and s[i] == ord("0"):
        digits = b"01234567"
        base = 8
    else:
        base = 10
    j = i
    while j < n and s[j : j + 1] in digits:
        j += 1
    if j == i:
        return 0
    return sign * int(s[i:j], base)


def parse_line(line: bytes) -> tuple[bytes, int]:
    """One wordsfile line -> (word, freq), mkdict.cpp:59 semantics
    including the no-tab npos+1 wraparound (see module docstring)."""
    tab = line.find(b"\t")
    if tab >= 0:
        return line[:tab], strtol0(line[tab + 1 :])
    # find()==npos, npos+1 wraps to 0: value = substr(0, size-1)
    return line, strtol0(line[:-1])


def compile_dict(lines, out_path: str) -> int:
    entries: dict[bytes, int] = {}
    for line in lines:
        word, freq = parse_line(line.rstrip(b"\r\n"))
        # std::map::insert keeps the first occurrence
        entries.setdefault(word, freq)
    print("Preparing...")
    if b"" in entries:
        # darts rejects the zero-length key; the reference's build
        # callback fails the same way on a blank input line
        print("Error: cannot build Chinese dictionary", file=sys.stderr)
        return 1
    try:
        with open(out_path, "wb") as f:
            for word in sorted(entries):  # darts needs byte-sorted keys
                f.write(word + b"\t" + str(entries[word]).encode() + b"\n")
            size = f.tell()
    except OSError:
        print(
            f"Error: cannot save Chinese dictionary: {out_path}",
            file=sys.stderr,
        )
        return 1
    print(f"Total words:\t\t\t{len(entries)}")
    print(f"File size:\t\t\t{size} bytes")
    print("Chinese dictionary was successfully created!")
    return 0


def main(argv: list[str]) -> int:
    if len(argv) != 3:
        print(f"Usage: {argv[0]} wordsfile dictfile", file=sys.stderr)
        print("Make Chinese dictionary from wordsfile", file=sys.stderr)
        return 1
    key_path, out_path = argv[1], argv[2]
    if key_path == "-":
        return compile_dict(sys.stdin.buffer, out_path)
    try:
        f = open(key_path, "rb")
    except OSError:
        print(f"Error: cannot open: {key_path}", file=sys.stderr)
        return 1
    with f:
        return compile_dict(f, out_path)


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
