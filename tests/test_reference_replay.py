"""Reference e2e replay — the fast subset, inside the pytest suite.

The full sweep (`python scripts/ref_sweep.py`, ~35 min) replays every
`test/test_NN/model.bin` golden of the reference's own e2e suite and
is recorded in REPLAY_SWEEP.log (56 tests, 2,305 query×subtest
entries, zero diffs).  This module keeps a representative fast slice
(each under ~12 s) in the standard `pytest tests/` run so reference
rank-identity regressions surface without the full sweep: geo anchors
(07/08/09), legacy modes (10/13/16/17), rankers (30/37-family via 30),
multi-index + merges + kill-lists (34/61/64/78/93), id64 uint64 docids
(47/50), unpack (43), BEFORE/proximity (52-family via 59/94/95),
SphinxQL-era attr/group tests (22/33/35/38/54/77/97), exact words
(55), and xmlpipe2 (68).
"""

from __future__ import annotations

import pytest

from tests.reference_harness import replay_all

FAST_TESTS = [
    "test_07", "test_08", "test_09", "test_10", "test_13", "test_16",
    "test_17", "test_22", "test_30", "test_33", "test_34", "test_35",
    "test_38", "test_43", "test_47", "test_48", "test_50", "test_53",
    "test_54", "test_55", "test_59", "test_61", "test_64", "test_68",
    "test_77", "test_78", "test_93", "test_94", "test_95", "test_97",
]


@pytest.fixture(scope="module")
def spark():
    from sphinx_1_spark.session import get_spark

    s = get_spark(cores=8)
    s.sparkContext.setLogLevel("ERROR")
    return s


@pytest.mark.parametrize("test_id", FAST_TESTS)
def test_reference_replay(spark, test_id):
    diffs = replay_all(spark, test_id)
    assert diffs == [], "\n".join(diffs)
