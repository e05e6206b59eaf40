"""Pallas TPU kernel for the folded nearest-upsample2 + Conv3D(3^3, SAME).

Why a kernel: the XLA formulation (8 phase convs, ops/fused_upsample_conv.py)
runs ~5x below the matmul bound on v5e — per-conv fixed overhead and layout
passes dominate at these tiny spatial shapes, and no XLA-level restructuring
beats it (union-window blocked conv, batched-group vmap conv, unfolded conv
all measured slower; docs/PERF.md round 2).  This kernel does a whole stage
in ONE pass:

* grid over batch tiles; the padded input block and all 64 folded tap
  matrices stay in VMEM across the stage;
* per phase (a,b,c): accumulate 8 tap matmuls  patch(p,q,r) @ W[phase,tap]
  into an f32 tile (K = Cin per dot — one MXU pass; rows = bt*D*H*W) and
  write it to the phase-major output slot out[:, phase] — a full-block
  static write, no strided stores;
* the caller interleaves (B, 8, D, H, W, C) -> (B, 2D, 2H, 2W, C) with one
  XLA transpose (the same interleave the phase-conv formulation pays).

Gradients: the op is linear; custom_vjp delegates both cotangents to the XLA
formulation's autodiff (identical math).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from prdisagg_tpu.ops.fused_upsample_conv import _phase_kernels, upsample2_conv3

_PHASES = [(a, b, c) for a in range(2) for b in range(2) for c in range(2)]


def _make_kernel(bt: int, d: int, h: int, w: int, cin: int, cout: int,
                 out_dtype):
    rows = bt * d * h * w

    def kernel(x_ref, w_ref, out_ref):
        # x_ref: (bt, d+2, h+2, w+2, cin); w_ref: (8 phases, 8 taps, cin, cout)
        # out_ref: (bt, 8, d, h, w, cout)
        for pi, (a, b, c) in enumerate(_PHASES):
            acc = jnp.zeros((rows, cout), jnp.float32)
            for ti, (p, q, r) in enumerate(_PHASES):  # taps share the 2^3 set
                lhs = x_ref[:, a + p:a + p + d, b + q:b + q + h,
                            c + r:c + r + w, :].reshape(rows, cin)
                acc += jnp.dot(lhs, w_ref[pi, ti],
                               preferred_element_type=jnp.float32)
            out_ref[:, pi] = acc.reshape(bt, d, h, w, cout).astype(out_dtype)

    return kernel


@partial(jax.jit, static_argnames=("bt", "interpret"))
def _upsample2_conv3_pallas_raw(x, k2, bt: int = 2, interpret: bool = False):
    """x: (B, D, H, W, Cin); k2: (8 phases, 8 taps, Cin, Cout).
    Returns (B, 2D, 2H, 2W, Cout) WITHOUT bias."""
    b, d, h, w, cin = x.shape
    cout = k2.shape[-1]
    if b % bt != 0:
        bt = 1
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))

    out = pl.pallas_call(
        _make_kernel(bt, d, h, w, cin, cout, x.dtype),
        out_shape=jax.ShapeDtypeStruct((b, 8, d, h, w, cout), x.dtype),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, d + 2, h + 2, w + 2, cin),
                         lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 8, cin, cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bt, 8, d, h, w, cout),
            lambda i: (i, 0, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(xp, k2)
    # interleave phases: (B, (2,2,2), D, H, W, C) -> (B, 2D, 2H, 2W, C)
    out = out.reshape(b, 2, 2, 2, d, h, w, cout)
    out = jnp.transpose(out, (0, 4, 1, 5, 2, 6, 3, 7))
    return out.reshape(b, 2 * d, 2 * h, 2 * w, cout)


def _build(interpret: bool):
    @jax.custom_vjp
    def f(x, kernel, bias):
        k2 = _phase_kernels(kernel).reshape(8, 8, *kernel.shape[-2:])
        return _upsample2_conv3_pallas_raw(x, k2, interpret=interpret) + bias

    def _fwd(x, kernel, bias):
        return f(x, kernel, bias), (x, kernel)

    def _bwd(res, g):
        x, kernel = res
        # the op is linear: reuse the XLA formulation's autodiff (same math)
        _, vjp = jax.vjp(
            lambda xx, kk: upsample2_conv3(
                xx, kk, jnp.zeros(kernel.shape[-1], kernel.dtype)),
            x, kernel)
        dx, dk = vjp(g)
        db = jnp.sum(g, axis=tuple(range(g.ndim - 1)))
        return dx, dk, db

    f.defvjp(_fwd, _bwd)
    return f


#: Drop-in replacement for ops.fused_upsample_conv.upsample2_conv3 with the
#: forward as a single Pallas kernel (TPU).
upsample2_conv3_pallas = _build(False)
#: interpreter-mode variant for CPU tests
upsample2_conv3_pallas_interpret = _build(True)
