"""Unit pinning for the in-training validation metric (VERDICT r3 #10).

The evaluator reports fractions in [0,1]; the AP50 gate space
(SOLVER.INITIAL_AP50, reference trainer.py:350) is percent. The old
``cur * 100 if cur <= 1.0 else cur`` heuristic would silently re-scale a
legitimately tiny percent value; the pinned converter asserts the
contract instead.
"""

import pytest

from scan_tpu.engine.trainer import to_percent_ap


def test_fraction_scales_once():
    assert to_percent_ap(0.423) == pytest.approx(42.3)
    assert to_percent_ap(0.0) == 0.0
    assert to_percent_ap(1.0) == 100.0
    # a tiny fraction stays tiny-percent — the old heuristic's ambiguity
    assert to_percent_ap(0.004) == pytest.approx(0.4)


def test_percent_input_rejected():
    with pytest.raises(AssertionError):
        to_percent_ap(42.3)
    with pytest.raises(AssertionError):
        to_percent_ap(-0.1)
