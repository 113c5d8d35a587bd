"""Independent cross-check of the multimodal golden oracles (ADVICE r4).

tools/golden_independent.py reconstructs every fixture's ground truth
from its synthesis seeds/formulas — NO gigaspark codec imports — and
recomputes the expected features with fresh implementations of the
documented formulas.  A decode bug that existed at golden-generation
time (which tools/make_golden.py alone cannot see, since it runs the
queries under test) fails here.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.golden_independent import VERIFIERS  # noqa: E402

import pytest  # noqa: E402


@pytest.mark.parametrize("name", sorted(VERIFIERS))
def test_golden_independent(name):
    fails = VERIFIERS[name]()
    assert not fails, f"{name}: {fails[:10]}"
