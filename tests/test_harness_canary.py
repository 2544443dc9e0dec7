"""Diff-injection canaries for the reference-replay comparator.

REPLAY_SWEEP.log's "56/56 OK, zero diffs" evidence is only as strong
as tests/reference_harness.compare_result actually *comparing*: a
comparator that silently returned [] on mismatching inputs would make
the whole sweep vacuous.  These tests inject one perturbation per diff
channel — match order, weight, attr value, missing attr, total,
total_found, per-word stats, expected-error asymmetry — and assert
each is reported, plus that the genuinely-identical case still passes.
Pure Python, no Spark session.
"""

from __future__ import annotations

import copy

from tests.reference_harness import _attr_eq, compare_result


def test_attempted_tests_parse_every_golden_query():
    """Every sweep-attempted test must parse exactly one <query> per
    model.bin entry in every subtest — the count guard in replay()
    (and this pin) keep a query-parser regression from silently
    shrinking the compared set to a vacuous 'zero diffs'."""
    from tests.reference_harness import load_test, subtest_count
    from tests.test_reference_replay import FAST_TESTS

    for tid in FAST_TESTS:
        for st in range(subtest_count(tid)):
            t = load_test(tid, subtest=st)
            m = t.model[st]
            if m in ("failed", ["failed"]):
                continue
            assert len(t.queries) == len(m), (
                f"{tid} st{st}: parsed {len(t.queries)} queries, "
                f"golden has {len(m)} entries"
            )
            assert len(t.queries) > 0, f"{tid} st{st}: zero queries parsed"


def test_subtest_count_matches_golden_everywhere():
    """model.bin has one top-level entry per config-matrix subtest, so
    subtest_count (which drives replay_all's loop) must agree with the
    golden for EVERY reference test dir — an under-count would quietly
    replay a fraction of the matrix."""
    import os

    from tests.reference_harness import (
        REF_TEST_ROOT, load_test, subtest_count,
    )

    checked = 0
    for tid in sorted(os.listdir(REF_TEST_ROOT)):
        # test_28 ships no test.xml in the reference tree
        if not tid.startswith("test_") or tid == "test_28":
            continue
        n_st = subtest_count(tid)
        n_model = len(load_test(tid, subtest=0).model)
        assert n_st == n_model, f"{tid}: subtests {n_st} vs golden {n_model}"
        checked += 1
    assert checked >= 70


def _want():
    # a model.bin-shaped golden: dict-keyed matches (resarray=0)
    return {
        "matches": {
            "3": {"weight": "2500", "attrs": {"gid": "7", "lat": "0.5"}},
            "1": {"weight": "1500", "attrs": {"gid": "9", "lat": "1.25"}},
        },
        "total": "2",
        "total_found": "2",
        "words": {"hello": {"docs": "2", "hits": "5"}},
    }


def _got():
    # the engine-result shape run_query produces: ordered list of
    # (docid, weight, attrs) plus totals and word stats
    return {
        "matches": [
            (3, 2500, {"gid": 7, "lat": 0.5}),
            (1, 1500, {"gid": 9, "lat": 1.25}),
        ],
        "total": 2,
        "total_found": 2,
        "words": {"hello": {"docs": 2, "hits": 5}},
    }


def test_identical_passes():
    assert compare_result(_got(), _want()) == []


def test_weight_diff_flagged():
    got = _got()
    got["matches"][0] = (3, 2501, got["matches"][0][2])
    errs = compare_result(got, _want())
    assert errs and "matches differ" in errs[0]


def test_order_diff_flagged():
    got = _got()
    got["matches"] = got["matches"][::-1]
    errs = compare_result(got, _want())
    assert errs and "matches differ" in errs[0]


def test_missing_and_extra_match_flagged():
    got = _got()
    del got["matches"][1]
    assert any("matches differ" in e for e in compare_result(got, _want()))
    got = _got()
    got["matches"].append((9, 100, {}))
    assert any("matches differ" in e for e in compare_result(got, _want()))


def test_attr_value_diff_flagged():
    got = _got()
    got["matches"][0] = (3, 2500, {"gid": 8, "lat": 0.5})
    errs = compare_result(got, _want())
    assert any("attr gid" in e for e in errs)


def test_attr_missing_flagged():
    got = _got()
    got["matches"][0] = (3, 2500, {"lat": 0.5})
    errs = compare_result(got, _want())
    assert any("missing attr gid" in e for e in errs)


def test_attr_float_tolerance_is_tight():
    # float32 roundoff passes; a real value difference does not
    assert _attr_eq(0.5 + 1e-7, "0.5")
    assert not _attr_eq(0.51, "0.5")
    # MVA length mismatch is a diff even when the prefix agrees
    assert not _attr_eq([1, 2, 3], {0: "1", 1: "2"})


def test_totals_diff_flagged():
    got = _got()
    got["total"] = 3
    assert any("total:" in e for e in compare_result(got, _want()))
    got = _got()
    got["total_found"] = 99
    assert any("total_found" in e for e in compare_result(got, _want()))


def test_word_stats_diff_flagged():
    got = _got()
    got["words"]["hello"] = {"docs": 2, "hits": 6}
    assert any("word 'hello'" in e for e in compare_result(got, _want()))
    got = _got()
    got["words"] = {}
    assert any("word stats missing" in e for e in compare_result(got, _want()))


def test_error_asymmetry_flagged():
    # golden expects an error -> engine success must be a diff
    want = _want()
    want["error"] = "query error"
    assert any(
        "expected error" in e for e in compare_result(_got(), want)
    )
    # engine error on a success golden must be a diff
    got = _got()
    got["error"] = "boom"
    assert any("unexpected error" in e for e in compare_result(got, _want()))


def test_resarray_list_golden_compares():
    # SetArrayResult(true) goldens arrive as int-keyed PHP lists;
    # both the pass and the injected-diff paths must work there too
    want = {
        "matches": {
            0: {"id": "3", "weight": "2500", "attrs": {}},
            1: {"id": "1", "weight": "1500", "attrs": {}},
        },
        "total": "2",
        "total_found": "2",
        "words": {},
    }
    got = {
        "matches": [(3, 2500, {}), (1, 1500, {})],
        "total": 2,
        "total_found": 2,
        "words": {},
    }
    assert compare_result(got, copy.deepcopy(want)) == []
    got["matches"][1] = (2, 1500, {})
    assert any(
        "matches differ" in e
        for e in compare_result(got, copy.deepcopy(want))
    )
