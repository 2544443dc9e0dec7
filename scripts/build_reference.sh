#!/bin/sh
# Build the reference's binaries out-of-tree for the live differential
# tests (tests/test_ref_differential*.py).  The reference tree is
# read-only; we copy it to /tmp and build there.  -std=gnu++98 is
# required: the 2009-era `%"PRIi64"` string literals are user-defined-
# literal syntax errors under modern C++.
#
# Usage: sh scripts/build_reference.sh [ref_dir] [build_dir]
set -e
REF="${1:-/root/reference}"
OUT="${2:-/tmp/refbuild}"
SCRIPTS="$(cd "$(dirname "$0")" && pwd)"  # absolute: we cd into $OUT later

build_harnesses() {
    # tiny differential harnesses linked against the real libsphinx:
    # confdump parses a sphinx.conf through CSphConfigParser and dumps
    # SECTION/KEY chain lines; tokdump tokenizes stdin through the
    # real ISphTokenizer and prints one token per line
    for h in confdump tokdump stripdump snipdump stemdump exprdump; do
        g++ -O1 -std=gnu++98 -fpermissive -w -DHAVE_CONFIG_H \
            -I"$OUT/src" -I"$OUT/config" \
            "$SCRIPTS/$h.cpp" "$OUT/src/libsphinx.a" \
            -lm -lz -lexpat -lrt -lpthread -o "$OUT/src/$h"
    done
}

if [ -x "$OUT/src/spelldump" ] && [ -x "$OUT/src/confdump" ] \
    && [ -x "$OUT/src/tokdump" ] && [ -x "$OUT/src/stripdump" ] \
    && [ -x "$OUT/src/snipdump" ] && [ -x "$OUT/src/stemdump" ] \
    && [ -x "$OUT/src/exprdump" ]; then
    echo "already built: $OUT"
    exit 0
fi
if [ -x "$OUT/src/spelldump" ]; then
    # binaries exist but a harness doesn't: build just those
    build_harnesses
    echo "already built: $OUT (harnesses added)"
    exit 0
fi
rm -rf "$OUT"
cp -r "$REF" "$OUT"
cd "$OUT"
./configure --without-mysql --without-pgsql \
    CXXFLAGS="-O1 -std=gnu++98 -fpermissive -w" CFLAGS="-O1 -w" \
    > configure.log 2>&1
make -j"$(nproc)" > make.log 2>&1
build_harnesses
ls src/indexer src/search src/indextool src/mkdict src/spelldump \
   src/wordseg src/confdump src/tokdump src/stripdump src/snipdump src/stemdump src/exprdump
echo "built: $OUT"
