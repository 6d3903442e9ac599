"""D-major Pallas backward for the GEGLU gate product (VERDICT r5 task 8).

The ff block computes ``o = h * gelu(gate)`` with ``h, gate =
split(h_full, 2, axis=-1)``. Plain autodiff turns the backward's cotangent
combine into XLA pad+maximum fusions — two full-width ``[*, 2F]`` writes plus
a combine, 13.1 ms/step on SDXL b4 (docs/Guidelines.md VPU bucket); the
explicit-``concat`` and DUS rewrites both measured worse (r3 flag matrix)
because they add full-width passes of their own in the token-minor layout.

This kernel writes the combined ``d_hfull`` in ONE pass over D-MAJOR
operands — the flash-DT trick: the ff tensors physically keep tokens in the
minor (lane) dimension, so a logical ``swapaxes(-1, -2)`` to ``(B, 2F, T)``
is a layout no-op, and the h/gate split becomes a SUBLANE-axis block split
(free: two input refs with row-offset index maps). The output is emitted as
``(B, 2, F, T)`` — each grid step writes its dh and dgate blocks together —
and reshaped to ``(B, 2F, T)`` afterwards, which is a contiguous
(major-axis) split and therefore a bitcast, so no concat/pad ever
materializes and HBM traffic is the 5-tensor-pass minimum (read h, gate,
dy; write dh, dgate).

Reference analog: the reference has no GEGLU code of its own (torch autograd
inside diffusers models); net-new TPU infrastructure.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # tests flip this for CPU interpreter mode


def _pick(t: int, target: int) -> int:
    b = min(t, target)
    while t % b:
        b //= 2
    return b


def _bwd_kernel(h_ref, g_ref, dy_ref, out_ref):
    dy = dy_ref[0]
    g = g_ref[0]
    gact, gprime = jax.jvp(jax.nn.gelu, (g,), (jnp.ones_like(g),))
    out_ref[0, 0] = (dy * gact).astype(out_ref.dtype)
    out_ref[0, 1] = (dy * h_ref[0] * gprime).astype(out_ref.dtype)


def supported(h_full_shape) -> bool:
    """(B, T, 2F) with lane-friendly T; the small SD1.5 tiers fall back."""
    if len(h_full_shape) != 3:
        return False
    t, f2 = h_full_shape[-2], h_full_shape[-1]
    return t % 512 == 0 and f2 % 2 == 0 and (f2 // 2) % 256 == 0


def geglu_bwd_dt(h_full: jax.Array, dy: jax.Array) -> jax.Array:
    """d_hfull for ``o = h * gelu(gate)``; logical (B, T, 2F) in and out.

    Internally transposes to (B, 2F, T) — a bitcast when the producer's
    physical layout is already token-minor — and runs the one-pass kernel.
    """
    b, t, f2 = h_full.shape
    f = f2 // 2
    ht = jnp.swapaxes(h_full, -1, -2)  # (B, 2F, T)
    dyt = jnp.swapaxes(dy, -1, -2)     # (B, F, T)
    bf = _pick(f, 512)
    bt = _pick(t, 512)
    nf = f // bf
    grid = (b, nf, t // bt)
    h_spec = pl.BlockSpec((1, bf, bt), lambda bb, j, i: (bb, j, i),
                          memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, bf, bt), lambda bb, j, i: (bb, nf + j, i),
                          memory_space=pltpu.VMEM)
    dy_spec = pl.BlockSpec((1, bf, bt), lambda bb, j, i: (bb, j, i),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 2, bf, bt), lambda bb, j, i: (bb, 0, j, i),
                            memory_space=pltpu.VMEM)
    out4 = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[h_spec, g_spec, dy_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, 2, f, t), h_full.dtype),
        interpret=_INTERPRET,
    )(ht, ht, dyt)
    # (B, 2, F, T) -> (B, 2F, T): contiguous major-axis merge (bitcast)
    return jnp.swapaxes(out4.reshape(b, f2, t), -1, -2)
