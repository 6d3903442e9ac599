"""Dense-dW-free backward for the merged forward path.

The merged fast path runs each adapted layer ONCE with ``W_eff = W + ΔW(θ)``
(wrapper.py interceptor). Plain autodiff through that graph materializes a
DENSE ``dW_eff = xᵀ·dy`` for every adapted layer — a full frozen-base
weight-gradient matmul whose only consumer is the tiny chain into the adapter
factors θ. Profiled on SDXL@1024 b4 (v5e) those dense f32 weight grads are
106 ms of an 857 ms step (12%): f32[10240,1280] 41 ms, f32[1280,1280] 32 ms,
f32[1280,5120] 18 ms, …

For multilinear low-rank ΔW (LoRA up·down, LoKr kron factors) the same
cotangents have an exact factored reordering that never forms ``dW_eff`` —
e.g. ``d_up = dyᵀ·(x·downᵀ)`` — at a fraction of the FLOPs and HBM traffic.
``factored_merged_apply`` wraps the layer application in a
``jax.custom_vjp`` whose backward computes ``dx`` through the op's own VJP
and the adapter grads through a per-algo ``dtheta_fn``; the frozen base
weight gets a zero cotangent (DCE'd — the trainer never differentiates it).

Reference analog: the reference's hot loop (locon.py:309-332) runs on torch
autograd and pays the same dense dW; this reordering is net-new TPU
infrastructure (BASELINE north star "adapters ≈ free").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _dw1(spec_batched, a, b):
    """dW1-style contraction ``(n,p,k),(n,q,k)->(p,q)``.

    The direct einsum contracts the NON-ADJACENT (n, k) pair, so XLA lays
    the two rank-3 operands out n-minor for the dot — inserting HBM relayout
    copies of both (profiled ~19 ms/step of [4096,8,160] copies/reshapes on
    SDXL LoKr). The batched form (batch n, contract k, ``->npq``) keeps every
    operand in the n-row-major layout its producer already has; the (n,p,q)
    intermediate is tiny (p,q ≤ kron factor ~8-32) and the n-sum fuses.
    ``LYCORIS_TPU_LOKR_DW1=batched`` selects the batched form (opt-in
    until the in-train SDXL measurement lands)."""
    import os

    if os.environ.get("LYCORIS_TPU_LOKR_DW1", "flat") == "flat":
        return _e(spec_batched.replace("->n", "->"), a, b)
    return _e(spec_batched, a, b).sum(0)


def _e(spec, *ops):
    """f32-accumulating einsum, bf16 operands when any input is bf16.

    Mixed bf16×f32 einsum would PROMOTE the big activation operand to f32 —
    a full HBM convert pass per contraction (measured: SD1.5 5.79→5.06
    steps/s when the promotion was left in). Casting the small f32 factors
    down instead keeps one bf16 MXU pass with f32 accumulation — the same
    numeric class as the dense bf16 dW_eff this replaces. All-f32 inputs
    (the CPU parity tests) stay exact f32."""
    if any(o.dtype == jnp.bfloat16 for o in ops):
        ops = [o.astype(jnp.bfloat16) for o in ops]
    return jnp.einsum(spec, *ops, preferred_element_type=jnp.float32)


def worth_factoring(out_dim: int, in_dim: int, threshold: int = 512,
                    n_tokens: int | None = None) -> bool:
    """Roofline gate: the factored backward trades the dense dW matmul
    (N·in·out MXU FLOPs) for ~4 extra HBM passes over x/dy (N·(in+out)
    bytes·4). Both scale with N, so the crossover is the harmonic dimension
    in·out/(in+out) against FLOP/byte balance. Measured on v5e: SD1.5's
    320/640-channel layers (harmonic ≤ 320) LOSE (5.79→5.07 steps/s when
    factored unconditionally); SDXL's 1280+-channel layers (harmonic ≥ 569)
    are where the dense dW bucket's 106 ms/step lives.

    ``n_tokens`` adds an opt-in absolute-FLOPs gate: the factored chain
    costs a roughly FIXED per-module overhead (~10 tiny einsum/reshape/
    convert ops, ~0.1-0.15 ms of dispatch+relayout measured in the SDXL r3e
    trace — the [4096,8,8]/[32768,8] storm, ~70-90 ms/step over the ~480
    square-module applications), while the dense dW it replaces costs
    2·N·out·in MXU FLOPs (~0.07 ms for 1280² at N=4096, i.e. LESS than the
    overhead). With LYCORIS_TPU_FACTORED_GFLOP=G (default 0 = disabled),
    factoring additionally requires 2·N·out·in ≥ G·1e9.

    Measured r4 A/B on v5e (warm cache): harmonic threshold 512→1024 is the
    ADOPTED default — SDXL LoKr b4 1.3172 → 1.3437 (+2.0%), SD1.5 b8
    5.799 → 5.8959 (+1.7%). The GFLOP gate at G=25 (which keeps the
    640-tier ff layers' 107-GFLOP dense dW factored where threshold-1024
    flips them dense) measured 1.3117 — WORSE than both, so even
    big-dense-dW ff layers prefer the dense path; the gate ships disabled
    and is kept only as an experiment knob."""
    import os

    if (out_dim * in_dim) // (out_dim + in_dim) < threshold:
        return False
    if n_tokens is None:
        return True
    gflop_min = float(os.environ.get("LYCORIS_TPU_FACTORED_GFLOP", "0"))
    return 2.0 * n_tokens * out_dim * in_dim >= gflop_min * 1e9


def factored_merged_apply(x, w, b, theta, *, recon_fn, dtheta_fn, apply_fn,
                          dx_fn, dy2d_fn):
    """``apply_fn(x, w + recon_fn(theta), b)`` with a factored backward.

    - ``recon_fn(theta, out_dtype=None) -> ΔW`` (fp32-precision
      reconstruction emitted in ``out_dtype``; recomputed in the backward
      instead of cached — one cheap recon + W-sized add).
    - ``dtheta_fn(x2d, dy2d, theta) -> dθ`` — exact reordering of
      ``VJP(recon)(xᵀ·dy)`` that avoids the dense product.
    - ``apply_fn(x, w_eff, b) -> y`` — the layer op (plain linear or the
      head-split projection); must be linear in x and in w_eff.
    - ``dx_fn(g, w_eff) -> dx`` — the op's explicit input cotangent.
    - ``dy2d_fn(g) -> (N, out)`` — output cotangent to token-major 2D.

    ``x`` must already be torch-layout ``(..., in)``; cotangents for ``w``
    and ``b`` are zeros (frozen base — the trainer differentiates only θ).
    """

    # recon emits ΔW already in w's dtype (recon_fn's out_dtype): the f32
    # reconstruction math otherwise parks a full-precision ΔW in HBM at the
    # kron/matmul reshape boundary and every consumer re-reads + re-casts it
    # (profiled f32[10240,1280] operands on the SDXL ff dx fusions). The
    # consumer-side astype calls below become no-ops; in f32 (CPU tests,
    # merge tools) nothing changes.

    @jax.custom_vjp
    def f(x, w, b, theta):
        w_eff = w + recon_fn(theta, w.dtype)
        return apply_fn(x, w_eff, b)

    def fwd(x, w, b, theta):
        w_eff = w + recon_fn(theta, w.dtype)
        return apply_fn(x, w_eff, b), (x, w, b, theta)

    def bwd(res, g):
        x, w, b, theta = res
        w_eff = w + recon_fn(theta, w.dtype)
        dx = dx_fn(g, w_eff)
        x2d = x.reshape(-1, x.shape[-1])
        dy2d = dy2d_fn(g)
        dtheta = dtheta_fn(x2d, dy2d, theta)
        db = None if b is None else jnp.zeros_like(b)
        return dx, jnp.zeros_like(w), db, dtheta

    f.defvjp(fwd, bwd)
    return f(x, w, b, theta)


# ---------------------------------------------------------------------------
# per-algo factored cotangents (raw — the caller applies the α/r·multiplier
# scale and maps onto its param dict)
# ---------------------------------------------------------------------------


def lora_dtheta(x2d, dy2d, up, down, want_scalar=False):
    """Cotangents for ΔW = up @ down with up (out, r), down (r, in).

    d_up = dyᵀ·(x·downᵀ), d_down = (dy·up)ᵀ·x — two (N, r) intermediates
    instead of one (out, in) dense product. ``d_scalar`` (when requested) is
    the raw inner product <dY, X·ΔWᵀ> = Σ (dy·up)∘(x·downᵀ).
    """
    u = _e("ni,ri->nr", x2d, down)
    z = _e("no,or->nr", dy2d, up)
    d_up = _e("no,nr->or", dy2d, u)
    d_down = _e("nr,ni->ri", z, x2d)
    d_scalar = None
    if want_scalar:
        d_scalar = jnp.sum(z * u)
    return d_up, d_down, d_scalar


def lokr_dtheta(x2d, dy2d, w1_full, w2_full, w2_ab=None, want_scalar=False):
    """Cotangents for ΔW = kron(W1, W2): W1 (p, q), W2 (u, v), out = p·u,
    in = q·v (p, q are the small factors under the reference convention).

    Returns ``(dW1, dW2, d_scalar)`` — dW1/dW2 dense in the (small) factor
    shapes; the caller projects onto a/b splits where decomposed. When
    ``w2_ab=(A, B)`` with W2 = A·B, every contraction routes through the
    rank-r intermediates s = x·Bᵀ (N,q,r) and t = dy·A (N,p,r), so the
    largest temporary is rank-sized and dW2 is returned already projected as
    ``(dA, dB)``. With W2 full, the orderings pivot on the smaller of the
    in/out sides so the single big intermediate is min(N·q·u, N·p·v).
    """
    p, q = w1_full.shape
    if w2_ab is not None:
        u, v = w2_ab[0].shape[0], w2_ab[1].shape[1]
    else:
        u, v = w2_full.shape
    n = x2d.shape[0]
    x3 = x2d.reshape(n, q, v)
    dy3 = dy2d.reshape(n, p, u)

    if w2_ab is not None:
        a_f, b_f = w2_ab  # A (u, r), B (r, v)
        r = a_f.shape[1]
        import os

        pack = os.environ.get("LYCORIS_TPU_LOKR_PACK", "einsum")
        if pack == "hybrid":
            # r5: big-operand contractions as plain 2D GEMMs on row-major
            # bitcast views — the r5 SDXL profile shows the rank-3 einsum
            # forms relayout the BIG x3/dy3 operands ((512,8,8,1280)-shaped
            # copies, ~17 ms/step over the ff modules) even though they only
            # contract the minor dim. s/t/dA/dB touch x2d/dy2d in 2D
            # (m = n·q or n·p rows, contraction on the minor dim, zero
            # relayout); the W1 chain keeps the rank-3 einsums of the
            # `einsum` path but only ever on the TINY (n, p|q, r) tensors
            # (their relayouts measure ~1 ms total) — so none of the packed
            # path's kron(W1, I_r) extra FLOPs.
            x2 = x3.reshape(n * q, v)      # row-major collapse — bitcast
            dy2 = dy3.reshape(n * p, u)
            s = _e("mv,rv->mr", x2, b_f).reshape(n, q, r)
            t = _e("mu,ur->mr", dy2, a_f).reshape(n, p, r)
            dW1 = _dw1("npr,nqr->npq", t, s)
            qs = _e("pq,nqr->npr", w1_full, s)
            dA = _e("mu,mr->ur", dy2, qs.reshape(n * p, r))
            m = _e("pq,npr->nqr", w1_full, t)
            dB = _e("mr,mv->rv", m.reshape(n * q, r), x2)
            d_scalar = jnp.sum(t * qs) if want_scalar else None
            return dW1, (dA, dB), d_scalar
        if pack != "packed":
            # factored rank-3 einsum forms — the measured DEFAULT. Warm-cache
            # v5e A/B (r3F/r4 matrix): SDXL LoKr b4 einsum 1.319 steps/s vs
            # packed 1.199 (−9%); SD1.5 b8 einsum ~5.78 vs packed 5.68. The
            # packed 2D rewrite below kills the rank-3 relayout copies it
            # targets but its flat contraction does q× the FLOPs —
            # net loss at SD shapes. Kept as LYCORIS_TPU_LOKR_PACK=packed
            # (parity-tested) for future A/Bs at other factor sizes.
            s = _e("nqv,rv->nqr", x3, b_f)
            t = _e("npu,ur->npr", dy3, a_f)
            dW1 = _dw1("npr,nqr->npq", t, s)
            qs = _e("pq,nqr->npr", w1_full, s)
            dA = _e("npu,npr->ur", dy3, qs)
            m = _e("pq,npr->nqr", w1_full, t)
            dB = _e("nqr,nqv->rv", m, x3)
            d_scalar = jnp.sum(t * qs) if want_scalar else None
            return dW1, (dA, dB), d_scalar
        # 2D-packed contractions on bitcast views. The direct einsum forms
        # ("nqv,rv->nqr", "pq,nqr->npr", "npu,npr->ur", ...) contract middle
        # or non-adjacent dims, so XLA relayouts the rank-3 operands between
        # every pair — profiled ~2000 (n,8,8)-shaped copies/fusions ≈ 45
        # ms/step on SDXL LoKr b4. Every contraction below is a plain 2D
        # matmul whose operand views are row-major collapses (free bitcasts):
        #   s = x·Bᵀ, t = dy·A, and the W1 contractions ride ONE tiny
        #   K = kron(W1, I_r) (pr × qr, e.g. 64×64) built per call.
        x2 = x3.reshape(n * q, v)      # row-major collapse — bitcast of x2d
        dy2 = dy3.reshape(n * p, u)    # likewise of dy2d
        s2 = _e("mv,rv->mr", x2, b_f)                             # (n·q, r)
        t2 = _e("mu,ur->mr", dy2, a_f)                            # (n·p, r)
        eye_r = jnp.eye(r, dtype=w1_full.dtype)
        K = (w1_full[:, None, :, None] * eye_r[None, :, None, :]).reshape(
            p * r, q * r
        )
        dW1 = _dw1("npr,nqr->npq", t2.reshape(n, p, r), s2.reshape(n, q, r))
        qs2 = _e("mx,px->mp", s2.reshape(n, q * r), K)            # (n, p·r)
        dA = _e("mu,mr->ur", dy2, qs2.reshape(n * p, r))
        m2 = _e("mx,xq->mq", t2.reshape(n, p * r), K)             # (n, q·r)
        dB = _e("mr,mv->rv", m2.reshape(n * q, r), x2)
        d_scalar = (
            jnp.sum(t2.reshape(n, p * r) * qs2) if want_scalar else None
        )
        return dW1, (dA, dB), d_scalar

    if v <= u:  # pivot on the in side: (n, p, v) intermediates
        P = _e("npu,uv->npv", dy3, w2_full)
        dW1 = _dw1("npv,nqv->npq", P, x3)
        Q = _e("pq,nqv->npv", w1_full, x3)
        dW2 = _e("npu,npv->uv", dy3, Q)
        d_scalar = jnp.sum(P * Q) if want_scalar else None
    else:  # pivot on the out side: (n, q, u) intermediates
        U = _e("nqv,uv->nqu", x3, w2_full)
        dW1 = _dw1("npu,nqu->npq", dy3, U)
        R = _e("pq,npu->nqu", w1_full, dy3)
        dW2 = _e("nqu,nqv->uv", R, x3)
        d_scalar = jnp.sum(U * R) if want_scalar else None
    return dW1, dW2, d_scalar
