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
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    h, w, c = 400, 672, 64
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(b, h, w, 4 * c).astype(np.float32)).astype(
        jnp.bfloat16
    )
    scale = jnp.float32(0.37)
    fns = {"slice": f_slice, "reshape": f_reshape, "pair2": f_pair2}
    ref = None
    for name, fn in fns.items():
        out = fn(z, scale, c)
        out_np = np.asarray(out)
        if ref is None:
            ref = out_np
        else:
            np.testing.assert_array_equal(out_np, ref)  # same math
        iters = 20
        t0 = time.perf_counter()
        outs = [fn(z, scale, c) for _ in range(iters)]
        _ = np.asarray(outs[-1][0, 0, 0])
        dt = (time.perf_counter() - t0) / iters * 1e3
        gb = (z.nbytes + out_np.nbytes) / 1e9
        print(f"{name:8s} {dt:7.2f} ms  ({gb / dt * 1e3:.0f} GB/s)")


if __name__ == "__main__":
    main()
