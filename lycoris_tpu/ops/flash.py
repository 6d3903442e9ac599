"""Custom TPU flash attention for diffusion self-attention (small head_dim).

Why not jax's stock pallas flash kernel: at SD shapes (B8 H8 T4096 D40) the
stock kernel measures 22 ms/layer fwd+bwd (tuned blocks). Its backward runs
TWO passes (dkv + dq), each recomputing S and P — 9 big matmuls total — and
round-trips l/m/di as (B, H, T, 128)-broadcast f32 arrays through HBM
(~128 MB each at these shapes). This kernel:

- fwd: K/V stay VMEM-resident per (batch·head); logits for a whole q-block
  row live in a VMEM scratch so softmax uses the TRUE row max in ONE exp
  pass — no online-rescaling VPU ops, better numerics than running-max.
- bwd: ONE fused pass over k-blocks computes dq, dk, dv together — S and P
  are recomputed once, not twice (7 matmuls, the recompute-flash minimum).
  Work runs in the transposed (k-row) layout so the per-row softmax stats
  broadcast as lane vectors and dv/dk are direct NN matmuls.
- softmax stats cross fwd→bwd as ONE fused logsumexp (B, H, T) f32 (1 MB),
  and di = rowsum(dO∘O) is a fused jax-level reduction — no 128-lane
  broadcast arrays.

The head_dim→128 lane padding on the MXU is intrinsic (the contraction of
QKᵀ and the output of PV are per-head d-sized; no packing can share them
across heads), so the win here is eliminating the third S pass, the
rescaling VPU traffic, and the stats round-trips.

Reference analog: the reference uses torch sdpa/xformers attention inside
kohya models (no attention code of its own); this kernel is net-new TPU
infrastructure (SURVEY §2.4 / BASELINE north star).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NT = (((1,), (1,)), ((), ()))  # contract last dims: a @ b.T
_TN = (((0,), (0,)), ((), ()))  # contract first dims: a.T @ b


def _pick(t: int, target: int) -> int:
    b = min(t, target)
    while t % b:
        b //= 2
    return b


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, s_scr, *, sm_scale, block_k):
    qi = pl.program_id(1)
    q = q_ref[0]  # [bq, d]
    t = k_ref.shape[1]
    nk = t // block_k
    # pass A: all logits for this q-block into VMEM scratch, tracking the max
    m = None
    for j in range(nk):
        k = k_ref[0, j * block_k:(j + 1) * block_k, :]
        s = lax.dot_general(q, k, _NT, preferred_element_type=jnp.float32)
        s *= sm_scale
        s_scr[:, j * block_k:(j + 1) * block_k] = s
        mj = jnp.max(s, axis=1, keepdims=True)
        m = mj if m is None else jnp.maximum(m, mj)
    # pass B: one exp with the true max; accumulate P·V and the row sum
    acc = jnp.zeros((q.shape[0], v_ref.shape[-1]), jnp.float32)
    l = jnp.zeros((q.shape[0], 1), jnp.float32)
    for j in range(nk):
        p = jnp.exp(s_scr[:, j * block_k:(j + 1) * block_k] - m)
        l += jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0, j * block_k:(j + 1) * block_k, :]
        acc += lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    bq = q.shape[0]
    # lse is (1, 1, T), VMEM-resident across the q grid dim; write our slice
    lse_ref[0, 0, pl.dslice(qi * bq, bq)] = (m + jnp.log(l)).reshape(-1)


def _fwd(q, k, v, sm_scale, block_q, block_k, interpret=False):
    bh, t, d = q.shape
    bq = _pick(t, block_q)
    bk = _pick(t, block_k)
    grid = (bh, t // bq)
    kv_spec = pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, sm_scale=sm_scale, block_k=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            kv_spec,
            kv_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, t, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, t), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bq, t), jnp.float32)],
        interpret=interpret,
    )(q, k, v)
    return o, lse


# ---------------------------------------------------------------------------
# forward, D-major ("dt") operands — (BH, D, T) in, (BH, D, T) out
# ---------------------------------------------------------------------------
#
# The SDXL qkv head-split einsums physically emit T-minor layouts (tokens in
# lanes); the standard kernel's custom-call boundary pins its operands to
# D-minor, so XLA inserts ~18 ms/step of HBM relayout copies (x306/step at
# [4,20,1024,64]). These variants take the operands with D and T swapped
# LOGICALLY — the jax-level transpose then matches the producer's physical
# layout and folds into a bitcast. Work runs k-row (S and P as [bk, bq]):
# softmax max/sum become sublane-axis reductions and the kq / pv / dq dots
# are MXU-native orientations (contraction on sublanes).


def _fwd_dt_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, s_scr, *, sm_scale, block_k):
    qi = pl.program_id(1)
    q = q_ref[0]  # [d, bq]
    t = k_ref.shape[-1]
    nk = t // block_k
    # pass A: all logits for this q-block into VMEM scratch ([t, bq], k-row),
    # tracking the true per-q max (axis 0 = sublanes)
    m = None
    for j in range(nk):
        k = k_ref[0, :, j * block_k:(j + 1) * block_k]  # [d, bk]
        s = lax.dot_general(k, q, _TN, preferred_element_type=jnp.float32)
        s *= sm_scale  # [bk, bq]
        s_scr[j * block_k:(j + 1) * block_k, :] = s
        mj = jnp.max(s, axis=0, keepdims=True)  # [1, bq]
        m = mj if m is None else jnp.maximum(m, mj)
    # pass B: one exp with the true max; accumulate V·P and the column sum
    acc = jnp.zeros((q.shape[0], q.shape[1]), jnp.float32)  # [d, bq]
    l = jnp.zeros((1, q.shape[1]), jnp.float32)
    for j in range(nk):
        p = jnp.exp(s_scr[j * block_k:(j + 1) * block_k, :] - m)  # [bk, bq]
        l += jnp.sum(p, axis=0, keepdims=True)
        v = v_ref[0, :, j * block_k:(j + 1) * block_k]  # [d, bk]
        acc += lax.dot_general(
            v, p.astype(v.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    bq = q.shape[1]
    lse_ref[0, 0, pl.dslice(qi * bq, bq)] = (m + jnp.log(l)).reshape(-1)


def _fwd_dt(q, k, v, sm_scale, block_q, block_k, interpret=False):
    bh, d, t = q.shape
    bq = _pick(t, block_q)
    bk = _pick(t, block_k)
    grid = (bh, t // bq)
    kv_spec = pl.BlockSpec((1, d, t), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_dt_kernel, sm_scale=sm_scale, block_k=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, d, bq), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            kv_spec,
            kv_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, d, bq), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, d, t), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, t), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((t, bq), jnp.float32)],
        interpret=interpret,
    )(q, k, v)
    return o, lse


# ---------------------------------------------------------------------------
# backward — one fused pass (dq, dk, dv), transposed (k-row) layout
# ---------------------------------------------------------------------------


def _bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
    dq_ref, dk_ref, dv_ref,
    *, sm_scale, block_q,
):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    k = k_ref[0]  # [bk, d]
    v = v_ref[0]
    t = q_ref.shape[1]
    d = q_ref.shape[-1]
    bk = k.shape[0]
    dk_acc = jnp.zeros((bk, d), jnp.float32)
    dv_acc = jnp.zeros((bk, d), jnp.float32)
    for j in range(t // block_q):
        sl = pl.dslice(j * block_q, block_q)
        q = q_ref[0, sl, :]       # [bq, d]
        do = do_ref[0, sl, :]
        lse = lse_ref[0, 0, sl].reshape(1, -1)   # [1, bq] — lane broadcast
        di = di_ref[0, 0, sl].reshape(1, -1)
        # transposed layout: rows are k, columns are q
        s_t = lax.dot_general(k, q, _NT, preferred_element_type=jnp.float32)
        p_t = jnp.exp(s_t * sm_scale - lse)   # normalized probs [bk, bq]
        pb = p_t.astype(do.dtype)
        dv_acc += lax.dot_general(
            pb, do, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp_t = lax.dot_general(v, do, _NT, preferred_element_type=jnp.float32)
        ds_t = (dp_t - di) * p_t * sm_scale
        dsb = ds_t.astype(q.dtype)
        dk_acc += lax.dot_general(
            dsb, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        # dq[j-block] += ds.T @ k — accumulates in the VMEM-resident out block
        dq_ref[0, sl, :] += lax.dot_general(
            dsb, k, _TN, preferred_element_type=jnp.float32
        )
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _bwd_call(q, k, v, do, lse, di, sm_scale, block_q, block_k, interpret=False):
    bh, t, d = q.shape
    bq = _pick(t, block_q)
    bk = _pick(t, block_k)
    grid = (bh, t // bk)
    res_spec = pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, 1, t), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, bk, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, sm_scale=sm_scale, block_q=bq),
        grid=grid,
        in_specs=[res_spec, kv_spec, kv_spec, res_spec, vec_spec, vec_spec],
        out_specs=[
            pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            kv_spec,
            kv_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, t, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, t, d), q.dtype),
            jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        ],
        interpret=interpret,
    )(q, k, v, do, lse, di)
    return dq.astype(q.dtype), dk, dv


def _bwd_dt_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
    dq_ref, dk_ref, dv_ref,
    *, sm_scale, block_q,
):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    k = k_ref[0]  # [d, bk]
    v = v_ref[0]
    t = q_ref.shape[-1]
    d = q_ref.shape[1]
    bk = k.shape[-1]
    dk_acc = jnp.zeros((d, bk), jnp.float32)
    dv_acc = jnp.zeros((d, bk), jnp.float32)
    for j in range(t // block_q):
        sl = pl.dslice(j * block_q, block_q)
        q = q_ref[0, :, sl]       # [d, bq]
        do = do_ref[0, :, sl]
        lse = lse_ref[0, 0, sl].reshape(1, -1)   # [1, bq] — lane broadcast
        di = di_ref[0, 0, sl].reshape(1, -1)
        s_t = lax.dot_general(k, q, _TN, preferred_element_type=jnp.float32)
        p_t = jnp.exp(s_t * sm_scale - lse)   # normalized probs [bk, bq]
        pb = p_t.astype(do.dtype)
        # dv_t = dO_t · P_tᵀ  (contract q)
        dv_acc += lax.dot_general(
            do, pb, _NT, preferred_element_type=jnp.float32
        )
        # dP_t = V_tᵀ · dO_t  (contract d, MXU-native)
        dp_t = lax.dot_general(v, do, _TN, preferred_element_type=jnp.float32)
        ds_t = (dp_t - di) * p_t * sm_scale
        dsb = ds_t.astype(q.dtype)
        # dk_t = Q_t · dS_tᵀ  (contract q)
        dk_acc += lax.dot_general(
            q, dsb, _NT, preferred_element_type=jnp.float32
        )
        # dq_t[:, j-block] += K_t · dS_t  (contract k, MXU-native)
        dq_ref[0, :, sl] += lax.dot_general(
            k, dsb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _bwd_dt_call(q, k, v, do, lse, di, sm_scale, block_q, block_k, interpret=False):
    bh, d, t = q.shape
    bq = _pick(t, block_q)
    bk = _pick(t, block_k)
    grid = (bh, t // bk)
    res_spec = pl.BlockSpec((1, d, t), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, 1, t), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, d, bk), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_dt_kernel, sm_scale=sm_scale, block_q=bq),
        grid=grid,
        in_specs=[res_spec, kv_spec, kv_spec, res_spec, vec_spec, vec_spec],
        out_specs=[
            pl.BlockSpec((1, d, t), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            kv_spec,
            kv_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, d, t), jnp.float32),
            jax.ShapeDtypeStruct((bh, d, t), q.dtype),
            jax.ShapeDtypeStruct((bh, d, t), q.dtype),
        ],
        interpret=interpret,
    )(q, k, v, do, lse, di)
    return dq.astype(q.dtype), dk, dv


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

_INTERPRET = False  # tests flip this for CPU interpreter mode


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def flash_attention(q, k, v, sm_scale, block_q=256, block_k=512,
                    block_q_bwd=None, block_k_bwd=None):
    """Non-causal self-attention, shapes (B, H, T, D), T % 128 == 0, D ≤ 128.

    Default blocks from the v5e sweep (bq×bk, fwd+bwd ms at B8):
    T4096 D40: 256/512→16.0 (stock kernel 22.9); T4096 D64 H10: 256/512→19.2
    (stock 28.2); T1024 D80: flat 4.7-4.9 (stock 5.9). bq=1024 exceeds VMEM
    (s_scr is bq×T f32).

    ``block_q_bwd``/``block_k_bwd`` tile the fused backward independently
    (inner q loop / k grid); None inherits the forward blocks. The bwd has no
    s_scr scratch, so its VMEM ceiling differs from the forward's."""
    o, _ = _flash_fwd(q, k, v, sm_scale, block_q, block_k)
    return o


def _flash_fwd(q, k, v, sm_scale, block_q, block_k):
    b, h, t, d = q.shape
    o, lse = _fwd(
        q.reshape(b * h, t, d), k.reshape(b * h, t, d), v.reshape(b * h, t, d),
        sm_scale, block_q, block_k, interpret=_INTERPRET,
    )
    return o.reshape(b, h, t, d), lse.reshape(b, h, t)


def _vjp_fwd(q, k, v, sm_scale, block_q, block_k, block_q_bwd, block_k_bwd):
    o, lse = _flash_fwd(q, k, v, sm_scale, block_q, block_k)
    return o, (q, k, v, o, lse)


def _bwd_from_res(res, g, sm_scale, block_q, block_k, block_q_bwd, block_k_bwd):
    q, k, v, o, lse = res
    b, h, t, d = q.shape
    # di = rowsum(dO ∘ O): one fused elementwise+reduce, no 128-lane broadcast
    di = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    dq, dk, dv = _bwd_call(
        q.reshape(b * h, t, d), k.reshape(b * h, t, d), v.reshape(b * h, t, d),
        g.reshape(b * h, t, d), lse.reshape(b * h, 1, t), di.reshape(b * h, 1, t),
        sm_scale, block_q_bwd or block_q, block_k_bwd or block_k,
        interpret=_INTERPRET,
    )
    rs = lambda x: x.reshape(b, h, t, d)
    return rs(dq), rs(dk), rs(dv)


def _vjp_bwd(sm_scale, block_q, block_k, block_q_bwd, block_k_bwd, res, g):
    return _bwd_from_res(res, g, sm_scale, block_q, block_k, block_q_bwd, block_k_bwd)


flash_attention.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# remat-friendly variant: the fwd kernel is dead code in a checkpoint replay
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _graft(q, k, v, o, lse, sm_scale, block_q, block_k, block_q_bwd, block_k_bwd):
    return o


def _graft_fwd(q, k, v, o, lse, sm_scale, block_q, block_k, block_q_bwd, block_k_bwd):
    return o, (q, k, v, o, lse)


def _graft_bwd(sm_scale, block_q, block_k, block_q_bwd, block_k_bwd, res, g):
    dq, dk, dv = _bwd_from_res(res, g, sm_scale, block_q, block_k,
                               block_q_bwd, block_k_bwd)
    # o/lse arrive via stop_gradient — these zeros are dropped by its
    # transpose and DCE'd by XLA
    return dq, dk, dv, jnp.zeros_like(res[3]), jnp.zeros_like(res[4])


_graft.defvjp(_graft_fwd, _graft_bwd)


def flash_attention_remat(q, k, v, sm_scale, block_q=256, block_k=512,
                          block_q_bwd=None, block_k_bwd=None):
    """``flash_attention`` whose fwd kernel is replay-DCE-able under
    ``jax.checkpoint(policy=save_only_these_names("attn_out", "attn_lse"))``.

    The plain op hides o/lse inside custom_vjp residuals, so a checkpointed
    backward must RE-RUN the fwd kernel to regenerate them even when the
    (checkpoint-named) output o itself was saved. Here the kernel runs
    outside the vjp under stop_gradient, o and lse are checkpoint-named
    jax-level tensors, and a grafted custom_vjp routes the gradient through
    explicit (q, k, v, o, lse) inputs — with both names saved, the replayed
    fwd kernel has no live consumers. lse is (B, H, T) f32: ~0.2% of the
    activation bytes the policy already saves per attention."""
    from jax.ad_checkpoint import checkpoint_name

    o, lse = _flash_fwd(
        lax.stop_gradient(q), lax.stop_gradient(k), lax.stop_gradient(v),
        sm_scale, block_q, block_k,
    )
    o = checkpoint_name(o, "attn_out")
    lse = checkpoint_name(lse, "attn_lse")
    return _graft(q, k, v, o, lse, sm_scale, block_q, block_k,
                  block_q_bwd, block_k_bwd)


# ---------------------------------------------------------------------------
# D-major public op (operands logically (B, H, D, T))
# ---------------------------------------------------------------------------


def _flash_fwd_dt(q, k, v, sm_scale, block_q, block_k):
    b, h, d, t = q.shape
    o, lse = _fwd_dt(
        q.reshape(b * h, d, t), k.reshape(b * h, d, t), v.reshape(b * h, d, t),
        sm_scale, block_q, block_k, interpret=_INTERPRET,
    )
    return o.reshape(b, h, d, t), lse.reshape(b, h, t)


def _bwd_dt_from_res(res, g, sm_scale, block_q, block_k, block_q_bwd, block_k_bwd):
    q, k, v, o, lse = res
    b, h, d, t = q.shape
    # di = colsum(dO_t ∘ O_t): reduction over d (sublanes)
    di = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=2)
    dq, dk, dv = _bwd_dt_call(
        q.reshape(b * h, d, t), k.reshape(b * h, d, t), v.reshape(b * h, d, t),
        g.reshape(b * h, d, t), lse.reshape(b * h, 1, t), di.reshape(b * h, 1, t),
        sm_scale, block_q_bwd or block_q, block_k_bwd or block_k,
        interpret=_INTERPRET,
    )
    rs = lambda x: x.reshape(b, h, d, t)
    return rs(dq), rs(dk), rs(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _graft_dt(q, k, v, o, lse, sm_scale, block_q, block_k, block_q_bwd, block_k_bwd):
    return o


def _graft_dt_fwd(q, k, v, o, lse, sm_scale, block_q, block_k, block_q_bwd, block_k_bwd):
    return o, (q, k, v, o, lse)


def _graft_dt_bwd(sm_scale, block_q, block_k, block_q_bwd, block_k_bwd, res, g):
    dq, dk, dv = _bwd_dt_from_res(res, g, sm_scale, block_q, block_k,
                                  block_q_bwd, block_k_bwd)
    return dq, dk, dv, jnp.zeros_like(res[3]), jnp.zeros_like(res[4])


_graft_dt.defvjp(_graft_dt_fwd, _graft_dt_bwd)


def flash_attention_remat_dt(q, k, v, sm_scale, block_q=256, block_k=512,
                             block_q_bwd=None, block_k_bwd=None):
    """D-major ``flash_attention_remat``: q/k/v and o are (B, H, D, T).

    Same replay-DCE graft as :func:`flash_attention_remat`; operand and
    result tensors keep tokens in the minor (lane) dimension so the
    projection matmuls on both sides connect without HBM relayout copies."""
    from jax.ad_checkpoint import checkpoint_name

    o, lse = _flash_fwd_dt(
        lax.stop_gradient(q), lax.stop_gradient(k), lax.stop_gradient(v),
        sm_scale, block_q, block_k,
    )
    o = checkpoint_name(o, "attn_out")
    lse = checkpoint_name(lse, "attn_lse")
    return _graft_dt(q, k, v, o, lse, sm_scale, block_q, block_k,
                     block_q_bwd, block_k_bwd)


def supported(q_shape, k_shape) -> bool:
    """Self-attention with T a multiple of 512 and head_dim ≤ 128."""
    tq, tk, d = q_shape[2], k_shape[2], q_shape[3]
    return tq == tk and tq >= 1024 and tq % 512 == 0 and d <= 128
