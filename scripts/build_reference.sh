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
if [ -x "$OUT/src/spelldump" ] && [ -x "$OUT/src/confdump" ]; then
    echo "already built: $OUT"
    exit 0
fi
if [ -x "$OUT/src/spelldump" ]; then
    # binaries exist but the confdump harness doesn't: build just it
    g++ -O1 -std=gnu++98 -fpermissive -w -DHAVE_CONFIG_H \
        -I"$OUT/src" -I"$OUT/config" \
        "$(dirname "$0")/confdump.cpp" "$OUT/src/libsphinx.a" \
        -lm -lz -lexpat -lrt -lpthread -o "$OUT/src/confdump"
    echo "already built: $OUT (confdump added)"
    exit 0
fi
rm -rf "$OUT"
cp -r "$REF" "$OUT"
cd "$OUT"
./configure --without-mysql --without-pgsql \
    CXXFLAGS="-O1 -std=gnu++98 -fpermissive -w" CFLAGS="-O1 -w" \
    > configure.log 2>&1
make -j"$(nproc)" > make.log 2>&1
# confdump: tiny harness for the config-parser differential tests —
# parses a sphinx.conf through the REAL CSphConfigParser and dumps
# SECTION/KEY lines (value chains in order) plus its ERROR/WARNING
# stdout verbatim
g++ -O1 -std=gnu++98 -fpermissive -w -DHAVE_CONFIG_H \
    -I"$OUT/src" -I"$OUT/config" \
    "$(dirname "$0")/confdump.cpp" "$OUT/src/libsphinx.a" \
    -lm -lz -lexpat -lrt -lpthread -o "$OUT/src/confdump"
ls src/indexer src/search src/indextool src/mkdict src/spelldump \
   src/wordseg src/confdump
echo "built: $OUT"
