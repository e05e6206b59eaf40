"""Per-stage generator cost on TPU, measured with an IN-JIT fori_loop.

Per-dispatch overhead on the tunneled platform is ~10 ms, so sub-ms ops
cannot be timed with one dispatch per repetition.  Here each measurement is
ONE jitted program running the op `reps` times with a data dependency
(input scaled by exp(c*1e-38) where c comes from the previous output) so XLA
can neither hoist the op out of the loop nor overlap iterations.

Usage: python scripts/exp_gen_stages.py [B] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/prdisagg_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from prdisagg_tpu.ops.fused_upsample_conv import upsample2_conv3


def timeit_injit(f, *args, reps=100):
    """Mean per-iteration ms of f(*args), looped inside one jit program."""

    @jax.jit
    def many(*a):
        def body(i, c):
            a0 = a[0] * jnp.exp(c * 1e-38).astype(a[0].dtype)
            out = f(a0, *a[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            return c + leaf.ravel()[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    float(many(*args))  # compile + 1 run
    t0 = time.perf_counter()
    float(many(*args))
    return (time.perf_counter() - t0) / reps * 1e3


def _edge_mask(n, d):
    m = jnp.ones((n,), jnp.float32)
    if d == 1:
        m = m.at[n - 1].set(0.0)
    elif d == -1:
        m = m.at[0].set(0.0)
    return m


def head_conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )


def head_tapcols(x, k):
    wc = k.reshape(27, -1).T  # (Cin, 27)
    y = jnp.einsum("bdhwc,ct->bdhwt", x, wc,
                   preferred_element_type=jnp.float32)
    out = jnp.zeros(x.shape[:4], jnp.float32)
    t = 0
    for dd in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                col = jnp.roll(y[..., t], (-dd, -dy, -dx), axis=(1, 2, 3))
                col = col * _edge_mask(x.shape[1], dd)[None, :, None, None] \
                    * _edge_mask(x.shape[2], dy)[None, None, :, None] \
                    * _edge_mask(x.shape[3], dx)[None, None, None, :]
                out = out + col
                t += 1
    return out


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    xd = jax.random.normal(key, (B, 356), dt)
    wd = jax.random.normal(key, (356, 3072), dt)
    print(f"dense      {timeit_injit(lambda a, w: a @ w, xd, wd, reps=reps):7.3f} ms",
          flush=True)

    for name, (d, h, w_, cin, cout) in (
        ("stage0", (3, 2, 2, 256, 256)),
        ("stage1", (6, 4, 4, 256, 128)),
        ("stage2", (12, 8, 8, 128, 64)),
    ):
        x = jax.random.normal(key, (B, d, h, w_, cin), dt)
        k = jax.random.normal(key, (3, 3, 3, cin, cout), dt)
        bias = jnp.zeros((cout,), dt)
        print(f"{name} fold {timeit_injit(upsample2_conv3, x, k, bias, reps=reps):7.3f} ms",
              flush=True)

    x = jax.random.normal(key, (B, 24, 16, 16, 64), dt)
    k = jax.random.normal(key, (3, 3, 3, 64, 1), dt)
    print(f"head conv  {timeit_injit(head_conv, x, k, reps=reps):7.3f} ms",
          flush=True)
    print(f"head tapc  {timeit_injit(head_tapcols, x, k, reps=reps):7.3f} ms",
          flush=True)

    a = head_conv(x.astype(jnp.float32), k.astype(jnp.float32))[..., 0]
    b_ = head_tapcols(x.astype(jnp.float32), k.astype(jnp.float32))
    print(f"head tapcols max err vs conv: {float(jnp.max(jnp.abs(a - b_))):.2e}",
          flush=True)

    from prdisagg_tpu.ops import hour_softmax
    xs = jax.random.normal(key, (B, 24, 16, 16, 1), jnp.float32)
    print(f"softmax    {timeit_injit(hour_softmax, xs, reps=reps):7.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
