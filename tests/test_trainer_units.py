"""Unit pinning for the in-training validation metric (VERDICT r3 #10).

The evaluator reports fractions in [0,1]; the AP50 gate space
(SOLVER.INITIAL_AP50, reference trainer.py:350) is percent. The old
``cur * 100 if cur <= 1.0 else cur`` heuristic would silently re-scale a
legitimately tiny percent value; the pinned converter asserts the
contract instead.
"""

import math

import pytest

from scan_tpu.engine.trainer import check_finite, to_percent_ap
from scan_tpu.utils.metric_logger import SmoothedValue


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


def test_smoothed_median_is_nan_honest():
    """A NaN anywhere in the window must poison the median (the round-4
    stability run's collapse was hidden by sorted()'s undefined NaN
    placement returning stale finite medians)."""
    m = SmoothedValue(window_size=5)
    for v in (1.0, 2.0, 3.0):
        m.update(v)
    assert m.median == 2.0
    m.update(float("nan"))
    assert math.isnan(m.median)
    assert math.isnan(m.avg)
    assert math.isnan(m.global_avg)


def test_finite_guard_first_failure():
    """A NaN injected at iter k must raise AT iter k (VERDICT r4 #4) —
    not up to 19 optimizer steps later like the old 20-iter cadence."""
    import jax.numpy as jnp

    from scan_tpu.engine.trainer import FiniteGuard

    k = 7
    guard = FiniteGuard()
    raised_at = None
    try:
        for it in range(1, 20):
            # pipelined trainer placement: dispatch step `it`, THEN check
            # step it-1's scalar, THEN arm step `it` (engine/trainer.py);
            # the fetch of step k overlaps step k+1's device execution.
            loss = jnp.float32(float("nan") if it == k else 1.0)
            guard.check()
            guard.arm(it, loss)
    except FloatingPointError as e:
        raised_at = it
        assert f"at iter {k}" in str(e)
    # first-failure within the pipeline depth: the NaN at step k raises in
    # step k+1's body — 1 in-flight step, not up to 19 like the old
    # 20-iter cadence (VERDICT r4 #4 + round-5 pipelining, PERF.md r5).
    assert raised_at == k + 1, f"guard fired at {raised_at}, wanted {k + 1}"


def test_finite_guard_accepts_plain_floats():
    """numpy/python scalars (no copy_to_host_async) go through the
    AttributeError fallback path."""
    from scan_tpu.engine.trainer import FiniteGuard

    guard = FiniteGuard()
    guard.arm(1, 0.5)
    guard.check()
    guard.arm(2, float("inf"))
    with pytest.raises(FloatingPointError, match="at iter 2"):
        guard.check()


def test_check_finite_raises_and_names_terms():
    check_finite({"loss_total": 2.3, "loss_cls": 0.1}, it=20)
    with pytest.raises(FloatingPointError, match="loss_cls"):
        check_finite(
            {"loss_total": float("nan"), "loss_cls": float("inf"),
             "loss_reg": 0.2},
            it=1840,
        )
