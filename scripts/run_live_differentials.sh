#!/bin/sh
# ONE command for the whole live-differential program (round-5 VERDICT
# ask #6): build the 2009 reference in-sandbox if needed, then run
# every differential family against the compiled binaries and the
# real searchd daemon, printing a per-family pass/fail inventory.
# Non-zero exit on any diff (or on a failed reference build).
#
# Families (all under tests/, each skips itself cleanly only when the
# reference build is absent — which this script makes impossible):
#   harness    tokdump/stripdump/snipdump/stemdump/exprdump/confdump/
#              spelldump/mkdict differentials vs the real libsphinx
#   e2e        real indexer/search/indextool on random corpora,
#              indexer --merge, --buildstops/--buildfreqs, rotation
#   sphinxql   the REAL searchd daemon over mysql41 (SELECT battery,
#              OPTION paths, SHOW META, 10-seed random compositions)
#   api        the REAL searchd daemon over the binary SphinxAPI
#              (queries, UpdateAttributes, BuildKeywords, persistent
#              connections)
#
# Usage: sh scripts/run_live_differentials.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."

echo "== [0/5] reference build (/tmp/refbuild) =="
if ! sh scripts/build_reference.sh; then
    echo "FAIL: reference build failed" >&2
    exit 2
fi

fail=0
run_family() {
    name="$1"; shift
    echo "== $name =="
    if python -m pytest -q "$@"; then
        echo "== $name: PASS =="
    else
        echo "== $name: FAIL =="
        fail=1
    fi
}

run_family "[1/5] harness differentials" \
    tests/test_ref_differential.py
run_family "[2/5] e2e indexer/search/indextool differentials" \
    tests/test_ref_e2e_differential.py
run_family "[3/5] live searchd (SphinxQL mysql41)" \
    tests/test_ref_searchd_differential.py
run_family "[4/5] live searchd (binary SphinxAPI)" \
    tests/test_ref_searchd_api_differential.py
run_family "[5/5] reference test-suite replay (incl. live entries)" \
    tests/test_reference_replay.py

if [ "$fail" -ne 0 ]; then
    echo "LIVE DIFFERENTIALS: FAIL (see inventory above)" >&2
    exit 1
fi
echo "LIVE DIFFERENTIALS: ALL FAMILIES PASS"
