"""Multi-device data-parallel step on the virtual 8-CPU mesh."""

import jax
import pytest


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    n = min(8, len(jax.devices()))
    assert n == 8, f"conftest should give 8 cpu devices, got {jax.devices()}"
    ge.dryrun_multichip(8)
