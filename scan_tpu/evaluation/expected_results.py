"""EXPECTED_RESULTS regression checking.

Parity target: reference ``evaluation/coco/coco_eval.py:403-423``
(``check_expected_results``): assert a metric lies within
sigma_tol * stddev of an expected value — the reference's mechanism for
regression-testing trained checkpoints via ``TEST.EXPECTED_RESULTS``.
"""

import logging

logger = logging.getLogger("scan_tpu.eval")


def check_expected_results(results, expected_results, sigma_tol):
    """expected_results: list of (task, metric, mean, std). results: a
    COCOResults-style dict (task 'bbox' implied)."""
    if not expected_results:
        return True
    ok = True
    for task, metric, mean, std in expected_results:
        actual = results.get(metric)
        if actual is None:
            logger.error("metric %s/%s missing from results", task, metric)
            ok = False
            continue
        lo, hi = mean - sigma_tol * std, mean + sigma_tol * std
        msg = (
            f"{task} > {metric} sanity check (actual vs. expected): "
            f"{actual:.4f} vs. mean={mean:.4f}, std={std:.4f}, "
            f"range=({lo:.4f}, {hi:.4f})"
        )
        if lo <= actual <= hi:
            logger.info("PASSED: %s", msg)
        else:
            logger.error("FAILED: %s", msg)
            ok = False
    return ok
