"""Alternatives for the generator's stage2 folded upsample-conv — the
hottest op (2.1 ms of the 4.96 ms B=160 bf16 forward, 18 TF/s at N=64).

Variants (all exactly equal to Conv3D(3^3,SAME)(upsample2(x))):
  phase8   current: 8 separate phase convs + interleave
  union1   ONE conv over the union window (+37% rows, Cout=8*cout blocked)
  im2col   explicit 2^3-tap patch build + single (8cin -> 8cout) matmul
  unfold   nearest-upsample then one standard 3^3 conv

Usage: python scripts/exp_stage2.py [B]
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

from prdisagg_tpu.ops import upsample3d_nearest
from prdisagg_tpu.ops.fused_upsample_conv import _phase_kernels, upsample2_conv3


def timeit_injit(f, *args, reps=100):
    @jax.jit
    def many(*a):
        def body(i, c):
            a0 = a[0] * jnp.exp(c * 1e-38).astype(a[0].dtype)
            out = f(a0, *a[1:])
            return c + out.ravel()[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    float(many(*args))
    t0 = time.perf_counter()
    float(many(*args))
    return (time.perf_counter() - t0) / reps * 1e3


def union1(x, kernel, bias):
    """One VALID conv over the zero-padded union window with the 8 phase
    kernels stacked along Cout, then slice+interleave."""
    b, d, h, w, cin = x.shape
    cout = kernel.shape[-1]
    k2 = _phase_kernels(kernel)  # (2,2,2 phases, 2,2,2 taps, cin, cout)
    # blocked kernel: taps first, phases folded into Cout
    kblk = jnp.transpose(k2, (3, 4, 5, 6, 0, 1, 2, 7)).reshape(
        2, 2, 2, cin, 8 * cout)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    dn = jax.lax.conv_dimension_numbers(
        xp.shape, kblk.shape, ("NDHWC", "DHWIO", "NDHWC"))
    y = jax.lax.conv_general_dilated(
        xp, kblk, (1, 1, 1), "VALID", dimension_numbers=dn,
        preferred_element_type=x.dtype,
    )  # (b, d+1, h+1, w+1, 8cout)
    y = y.reshape(b, d + 1, h + 1, w + 1, 2, 2, 2, cout)
    parts = []
    for a in range(2):
        for bb in range(2):
            for c in range(2):
                parts.append(y[:, a:a + d, bb:bb + h, c:c + w, a, bb, c])
    st = jnp.stack(parts).reshape(2, 2, 2, b, d, h, w, cout)
    out = jnp.transpose(st, (3, 4, 0, 5, 1, 6, 2, 7))
    return out.reshape(b, 2 * d, 2 * h, 2 * w, cout) + bias


def im2col(x, kernel, bias):
    """Patch build (2^3 shifted views) + one (8cin -> 8cout) matmul."""
    b, d, h, w, cin = x.shape
    cout = kernel.shape[-1]
    k2 = _phase_kernels(kernel)
    # weight: (taps pqr, cin) x (phases abc, cout)
    wmat = jnp.transpose(k2, (3, 4, 5, 6, 0, 1, 2, 7)).reshape(
        8 * cin, 8 * cout)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    views = []
    for p in range(2):
        for q in range(2):
            for r in range(2):
                views.append(xp[:, p:p + d, q:q + h, r:r + w, :])
    patches = jnp.concatenate(views, axis=-1)  # (b,d,h,w,8cin)
    y = patches.reshape(-1, 8 * cin) @ wmat    # (b*d*h*w, 8cout)
    y = y.reshape(b, d, h, w, 2, 2, 2, cout)
    out = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6, 7))
    return out.reshape(b, 2 * d, 2 * h, 2 * w, cout) + bias


def phase_vmap(x, kernel, bias):
    """All 8 phase convs as ONE vmapped conv (XLA lowers rhs-batched conv to
    a single batch_group_count kernel — kills 8x per-conv launch overhead)."""
    b, d, h, w, cin = x.shape
    cout = kernel.shape[-1]
    k2 = _phase_kernels(kernel)
    kp = k2.reshape(8, 2, 2, 2, cin, cout)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    wins = []
    for a in range(2):
        for bb in range(2):
            for c in range(2):
                wins.append(jax.lax.slice(
                    xp, (0, a, bb, c, 0),
                    (b, a + d + 1, bb + h + 1, c + w + 1, cin)))
    wins = jnp.stack(wins)  # (8, b, d+1, h+1, w+1, cin)
    dn = jax.lax.conv_dimension_numbers(
        wins.shape[1:], kp.shape[1:], ("NDHWC", "DHWIO", "NDHWC"))

    def one(wx, wk):
        return jax.lax.conv_general_dilated(
            wx, wk, (1, 1, 1), "VALID", dimension_numbers=dn,
            preferred_element_type=x.dtype)

    phases = jax.vmap(one)(wins, kp)  # (8, b, d, h, w, cout)
    st = phases.reshape(2, 2, 2, b, d, h, w, cout)
    out = jnp.transpose(st, (3, 4, 0, 5, 1, 6, 2, 7))
    return out.reshape(b, 2 * d, 2 * h, 2 * w, cout) + bias


def unfold(x, kernel, bias):
    xu = upsample3d_nearest(x, 2)
    dn = jax.lax.conv_dimension_numbers(
        xu.shape, kernel.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return jax.lax.conv_general_dilated(
        xu, kernel, (1, 1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=x.dtype,
    ) + bias


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    key = jax.random.PRNGKey(0)
    for (d, h, w, cin, cout), tag in (
        ((12, 8, 8, 128, 64), "stage2"),
        ((6, 4, 4, 256, 128), "stage1"),
        ((3, 2, 2, 256, 256), "stage0"),
    ):
        for dt in (jnp.bfloat16,):
            x = jax.random.normal(key, (B, d, h, w, cin), dt)
            k = jax.random.normal(key, (3, 3, 3, cin, cout), dt) * 0.05
            bias = jnp.zeros((cout,), dt)
            # correctness vs reference fold (f32)
            xf, kf, bf = (a.astype(jnp.float32) for a in (x, k, bias))
            ref = upsample2_conv3(xf, kf, bf)
            for name, f in (("union1", union1), ("unfold", unfold),
                            ("phase_vmap", phase_vmap)):
                got = f(xf, kf, bf)
                # TPU "f32" convs use default (bf16-pass) MXU precision, so
                # different summation groupings differ by bf16 rounding
                rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
                assert rel < 2e-2, (tag, name, rel)
            for name, f in (("phase8", upsample2_conv3), ("union1", union1),
                            ("unfold", unfold), ("phase_vmap", phase_vmap)):
                ms = timeit_injit(f, x, k, bias)
                print(f"{tag} {name:7s} {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
