"""Multi-device data-parallel correctness on the virtual 8-CPU mesh.

Beyond the smoke dryrun, asserts the property PARITY.md #9 claims: the
8-device sharded DA step produces the same params/prototype as the
single-device step. Gradient semantics match DDP (per-replica normalise,
then average), so equivalence is exact when every replica sees the same
slice — the batch is one image tiled 8x.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    """Runs in a fresh subprocess — the same way the driver invokes it.
    (In a long-lived pytest process that has already executed dozens of
    XLA:CPU programs, the 8-device shard_map program sporadically
    SIGABRTs inside XLA; a fresh process is the supported configuration
    and what the driver actually does.)"""
    import os
    import subprocess
    import sys

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    out = _run_with_abort_retry(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, r'%s');"
         "import __graft_entry__ as ge; ge.dryrun_multichip(8);"
         "print('DRYRUN_OK')" % repo],
        env=env, cwd=repo,
    )
    assert out.returncode == 0, (out.stderr[-3000:], out.stdout[-500:])
    assert "DRYRUN_OK" in out.stdout


def _run_with_abort_retry(cmd, env, cwd):
    """Run the child once; retry exactly once if it died on SIGABRT/SIGSEGV.
    This box's XLA:CPU sporadically aborts 8-virtual-device programs (an
    environment flake, not a product bug — see conftest.py); an assertion
    failure (returncode 1) is never retried."""
    import subprocess

    import warnings

    out = subprocess.run(cmd, env=env, cwd=cwd, capture_output=True,
                         text=True, timeout=3000)
    if out.returncode in (-6, -11, 134, 139):
        # loud, so a real crash regression can't hide behind the retry
        warnings.warn(
            "child died with signal (rc=%d), retrying once; stderr tail:\n%s"
            % (out.returncode, out.stderr[-2000:])
        )
        out = subprocess.run(cmd, env=env, cwd=cwd, capture_output=True,
                             text=True, timeout=3000)
    return out


def _dp_equivalence_main():
    """Body of the dp-equivalence check; run in a fresh process (see
    test_dp_step_matches_single_device for why)."""
    import __graft_entry__ as ge
    from scan_tpu.engine.dp import build_da_train_step
    from scan_tpu.modeling.detector import build_detector
    from scan_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from scan_tpu.solver.build import make_optimizer

    n = 8
    assert len(jax.devices()) >= n
    cfg = ge._tiny_cfg(max_nodes=32)
    cfg.TPU.COMPUTE_DTYPE = "float32"  # tight tolerance on CPU
    det = build_detector(cfg)
    mesh = make_mesh(dp=n, devices=jax.devices()[:n])

    batch_s, batch_t = ge.make_tiny_da_batch(n)
    params0, proto0 = det.init_params(
        jax.random.PRNGKey(0), batch_s["images"][:1]
    )
    opt = make_optimizer(cfg, params0)
    opt_state0 = opt.init(params0)

    def slice1(d):
        return {k: v[:1] for k, v in d.items()}

    # single-device: 2 steps with a forward_target flip on the 1-image slice
    step1 = build_da_train_step(det, opt, mesh=None)
    p1, o1, pr1 = params0, opt_state0, proto0
    for ft in (False, True):
        p1, o1, pr1, m1 = step1(
            p1, o1, pr1, slice1(batch_s), slice1(batch_t), forward_target=ft
        )

    # 8-device: same slice tiled over the mesh
    stepN = build_da_train_step(det, opt, mesh=mesh)
    pN = replicate(mesh, params0)
    oN = replicate(mesh, opt_state0)
    prN = replicate(mesh, proto0)
    bsN = shard_batch(mesh, batch_s)
    btN = shard_batch(mesh, batch_t)
    for ft in (False, True):
        pN, oN, prN, mN = stepN(pN, oN, prN, bsN, btN, forward_target=ft)

    # params equal leaf-by-leaf
    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flatN = dict(jax.tree_util.tree_leaves_with_path(pN))
    worst = 0.0
    for path, leaf in flat1:
        other = flatN[path]
        diff = float(jnp.abs(leaf - other).max())
        worst = max(worst, diff)
        assert diff < 1e-5, f"param mismatch at {jax.tree_util.keystr(path)}: {diff}"
    # prototype buffer synced + equal
    np.testing.assert_allclose(
        np.asarray(pr1.prototype), np.asarray(prN.prototype), atol=1e-5
    )
    # loss metrics agree (pmean of identical replicas)
    assert abs(float(m1["loss_total"]) - float(mN["loss_total"])) < 1e-4
    print(f"dp equivalence worst param diff: {worst:.2e}")
    print("DP_EQUIV_OK")


@pytest.mark.slow
def test_dp_step_matches_single_device():
    """Fresh-subprocess wrapper — the 8-device XLA:CPU program sporadically
    SIGABRTs when run inside a pytest process that has already executed
    many programs (same pattern as the dryrun test above)."""
    import os
    import subprocess
    import sys

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    out = _run_with_abort_retry(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, r'%s');"
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "from tests.test_multichip import _dp_equivalence_main;"
         "_dp_equivalence_main()" % repo],
        env=env, cwd=repo,
    )
    assert out.returncode == 0, (out.stderr[-3000:], out.stdout[-500:])
    assert "DP_EQUIV_OK" in out.stdout
