"""Micro-benchmark: formulations of the stem phase-max + requant pass.

The shipping int8-static stem pays one XLA loop fusion after the packed
conv: max over the four 64-lane phase slices of the bf16 (B,H/2,W/2,4C)
output + the successor's round/clip-to-s8 — 13.5 ms/batch32 at ~45% of
achievable HBM bandwidth (the 64-lane-offset slices defeat the
vectorizer; docs/perf/PERF.md). Pallas replacements lose on layout
(round-4 table). This probes whether a different *XLA* formulation of
the same math vectorizes better:

  slice   max(z[..,:c], z[..,c:2c], z[..,2c:3c], z[..,3c:])   (shipping)
  reshape jnp.max(z.reshape(b,h,w,4,c), axis=-2)
  pair2   reshape (b,h,w,2,2c) -> max -> (…,2c) reshape (…,2,c) -> max

Each timed standalone (jit, donated input excluded so every pass re-reads
HBM), median of N. Run on the real chip.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def requant(m, scale):
    m = jnp.maximum(m, 0.0)
    q = jnp.clip(jnp.round(m.astype(jnp.float32) / scale), -127.0, 127.0)
    return q.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("c",))
def f_slice(z, scale, c):
    m = jnp.maximum(
        jnp.maximum(z[..., :c], z[..., c:2 * c]),
        jnp.maximum(z[..., 2 * c:3 * c], z[..., 3 * c:]),
    )
    return requant(m, scale)


@functools.partial(jax.jit, static_argnames=("c",))
def f_reshape(z, scale, c):
    b, h, w, c4 = z.shape
    m = jnp.max(z.reshape(b, h, w, 4, c), axis=-2)
    return requant(m, scale)


@functools.partial(jax.jit, static_argnames=("c",))
def f_pair2(z, scale, c):
    b, h, w, c4 = z.shape
    m2 = jnp.max(z.reshape(b, h, w, 2, 2 * c), axis=-2)
    m = jnp.max(m2.reshape(b, h, w, 2, c), axis=-2)
    return requant(m, scale)


def main():
    # default batch 8, not the shipping 32: the async timing queue holds
    # every in-flight s8 output, and 20 x 550 MB (batch 32) + the 4.4 GB
    # bf16 input exhausts v5e HBM. 1.1 GB input is still far beyond any
    # cache, so the GB/s rate is the same HBM-bound figure.
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    h, w, c = 400, 672, 64
    # generate on device: a host randn of this shape is 17.6 GB of f64 and
    # minutes of single-core CPU + relay transfer
    z = jax.block_until_ready(jax.random.normal(
        jax.random.PRNGKey(0), (b, h, w, 4 * c), jnp.bfloat16
    ))
    scale = jnp.float32(0.37)
    fns = {"slice": f_slice, "reshape": f_reshape, "pair2": f_pair2}

    def timed_chain(fn, k):
        """Wall time of k async dispatches ended by ONE scalar readback.

        block_until_ready does not actually wait through the axon relay;
        only a device->host transfer does. The ~30 ms relay round-trip is
        cancelled by the k-vs-3k differencing below.
        """
        t0 = time.perf_counter()
        outs = [fn(z, scale, c) for _ in range(k)]
        _ = np.asarray(outs[-1][0, 0, 0])
        return time.perf_counter() - t0

    ref = None
    for name, fn in fns.items():
        out = fn(z, scale, c)
        if ref is None:
            ref = out
        else:
            # equality checked on device; pulling 550 MB s8 over the
            # relay per variant dominates the run otherwise
            eq = bool(np.asarray(jnp.array_equal(out, ref)))
            assert eq, f"{name} != slice"
        k = 10
        best = min(
            (timed_chain(fn, 3 * k) - timed_chain(fn, k)) / (2 * k)
            for _ in range(3)
        )
        dt = best * 1e3
        gb = (z.nbytes + out.nbytes) / 1e9
        print(f"{name:8s} {dt:7.2f} ms  ({gb / dt * 1e3:.0f} GB/s)")


if __name__ == "__main__":
    main()
