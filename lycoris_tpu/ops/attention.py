"""Attention dispatch: TPU Pallas flash attention for long self-attention.

The SD UNet's self-attention at 64×64 latents runs T=4096 tokens; the
unfused XLA path materializes (B, H, T, T) logits in HBM (≈2 GB per layer at
batch 8). The Pallas flash kernel (jax.experimental.pallas.ops.tpu.
flash_attention, differentiable) streams K/V tiles through VMEM instead.

``dot_product_attention(q, k, v)`` takes (B, T, H, D) like
jax.nn.dot_product_attention and dispatches to the Pallas kernel when:
- running on a TPU backend (and LYCORIS_TPU_NO_PALLAS != 1),
- q and k share the sequence length (self-attention; cross-attention's
  77-token K/V doesn't meet the kernel's tiling constraints and is cheap
  anyway), and the length is a multiple of 512.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _use_flash(tq, tk, d) -> bool:
    mode = os.environ.get("LYCORIS_TPU_FLASH", "auto")
    if mode == "off" or os.environ.get("LYCORIS_TPU_NO_PALLAS", "0") == "1" or not _on_tpu():
        return False
    # the kernel pads head_dim up to 128 but requires multiples of 128 beyond
    d_ok = d <= 128 or d % 128 == 0
    return tq == tk and tq >= 1024 and tq % 1024 == 0 and d_ok


def _block_sizes(t: int):
    """Large (1024) blocks amortize the head-dim lane padding: measured on
    v5e at (B8, H8, T4096, D40) — fwd+bwd 22 ms vs 48 ms XLA vs 107 ms with
    the kernel's default blocks."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    bq = min(t, 1024)
    bk = min(t, 1024)
    # block_k_major_dq doubles as the lane width of a jax-level f32 broadcast
    # of di (B,H,T,block_k_major_dq) feeding the dq kernel — 512 halves that
    # HBM traffic and wins 0.6 ms/layer over 1024 at (B8,H8,T4096,D40);
    # 128 is slower (grid overhead outweighs the bandwidth saving)
    bkdq = min(t, 512)
    return fa.BlockSizes(
        block_q=bq, block_k_major=bk, block_k=512, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=512, block_q_dkv=bq,
        block_k_major_dq=bkdq, block_k_dq=bkdq, block_q_dq=bq,
    )


def dot_product_attention(q, k, v, layout="BTHD"):
    """Attention with automatic 1/sqrt(D) scaling; returns (B, T, H, D).

    ``layout="BTHD"`` (default): q/k/v are (B, T, H, D) like
    jax.nn.dot_product_attention. ``layout="BHTD"``: q/k/v arrive pre-split
    head-major (B, H, T, D) — the layout head-split projections produce and
    the flash kernel consumes, so the self-attention path runs with ONE
    transpose (kernel output) instead of four.

    LYCORIS_TPU_FLASH: auto (default, custom kernel where supported) |
    custom | stock (jax's pallas flash) | off (XLA).
    """
    mode = os.environ.get("LYCORIS_TPU_FLASH", "auto")
    bhtd = layout == "BHTD"
    t_axis = 2 if bhtd else 1
    tq, tk, d = q.shape[t_axis], k.shape[t_axis], q.shape[-1]
    sm_scale = 1.0 / (d**0.5)

    def to_bhtd(x):
        return x if bhtd else x.transpose(0, 2, 1, 3)

    if mode in ("auto", "custom") and _use_flash(tq, tk, d):
        from . import flash

        qt = to_bhtd(q)
        if flash.supported(qt.shape, qt.shape):
            # v5e sweeps, fwd and bwd tiled independently, scan-timed (30
            # chained applies in one jit — per-call timing is swamped by the
            # ~1-3 ms remote-dispatch floor at T1024 scale): T4096 keeps the
            # fwd winners (D40 256/512, D64 512/512; bq1024 OOMs VMEM at
            # D40) with bwd bk widened to 1024 (~1%: D40 13.06→12.95, D64
            # 8.40→8.31 ms/apply). T1024 is flat within 3% across all
            # sane tilings (D64 2.19-2.27, D80 1.84-1.86 ms/apply).
            if tq <= 1024:
                bq, bk, bqb, bkb = 256, 1024, 128, 1024
            else:
                bq = 256 if d <= 48 else 512
                bk, bqb, bkb = 512, bq, 1024
            if os.environ.get("LYCORIS_TPU_FLASH_BLOCKS"):
                # experiment knob: "bq,bk,bq_bwd,bk_bwd" override
                bq, bk, bqb, bkb = (
                    int(v) for v in os.environ["LYCORIS_TPU_FLASH_BLOCKS"].split(","))
            # DEFAULT 1024 since r5 (was 2048): with the 512-block dt tiling
            # below, warm-cache A/B on the exact shipped config measured SDXL
            # b4 1.3743 -> 1.4422 (+4.9%; the ~26 ms/step of
            # (4,20,1024,64)-shaped boundary relayout copies in the r5 profile
            # vanish and the kernel itself gains ~18%) and SD1.5 b8
            # 6.1884 -> 6.2906 (+1.7%). The r3/r4 "T1024 executes ~1000x
            # slow" pathology was tied to the small-q-block dt tiling and no
            # longer reproduces (repro_compile_crash.py REPRO_CH=1280 HW=32
            # compiles in 23 s and runs).
            dt_min_t = int(os.environ.get("LYCORIS_TPU_FLASH_DT_MIN_T", "1024"))
            if os.environ.get("LYCORIS_TPU_FLASH_DT", "1") == "1" and tq >= dt_min_t:
                if not os.environ.get("LYCORIS_TPU_FLASH_BLOCKS"):
                    # r5: the D-major kernel wants 512-blocks at EVERY tier.
                    # T1024 sandwich sweep: dt was −16/−18% with the
                    # std-kernel tiling (bq 256/128) but +17.9% (D64) /
                    # +17.6% (D80) with 512s (tools/profiling/bench_dt.py);
                    # full-graph SD1.5 b8 (T4096/D40 tier was on bq256):
                    # 6.2906 -> 6.6074 (+5.0%) warm-cache. The old per-D
                    # bq choices came from the T-MAJOR kernel's sweeps and
                    # don't transfer to the k-row dt layout.
                    bq, bk, bqb, bkb = 512, 512, 512, 1024
                # D-major kernel: operands pass (B, H, D, T) — the logical
                # swap matches the T-minor layout the head-split projections
                # physically emit, so the custom-call boundary needs no HBM
                # relayout copies (x306/step on SDXL, ~18 ms).
                # DEFAULT-ON since r4: warm-cache A/B on the exact shipped
                # config measured SD1.5 b8 5.9075 -> 6.2397 (+5.6%) and SDXL
                # b4 1.3448 -> 1.3786 (+2.5%).
                # Gated to tq >= 2048: the projection-sandwich microbench
                # (tools/profiling/bench_dt.py, v5e) measures dt +18.9% at
                # (B4 H10 T4096 D64) but -18.4% at (B4 H20 T1024 D64), and
                # the r3 "dies mid-compile" crash repro'd as an EXECUTION
                # hang only at the T1024 tier under remat (attn_ff policy,
                # tools/profiling/repro_compile_crash.py REPRO_CH=1280).
                tr = lambda x: jnp.swapaxes(to_bhtd(x), -1, -2)
                o_t = flash.flash_attention_remat_dt(
                    tr(q), tr(k), tr(v), sm_scale, block_q=bq, block_k=bk,
                    block_q_bwd=bqb, block_k_bwd=bkb,
                )
                return o_t.transpose(0, 3, 1, 2)
            # remat variant: o/lse are checkpoint-named so the fwd kernel is
            # dead code in a checkpoint replay under the "attn_out"+"attn_lse"
            # save policy (models/unet.py remat="attn_out")
            o = flash.flash_attention_remat(
                qt, to_bhtd(k), to_bhtd(v), sm_scale, block_q=bq, block_k=bk,
                block_q_bwd=bqb, block_k_bwd=bkb,
            )
            return o.transpose(0, 2, 1, 3)
    from jax.ad_checkpoint import checkpoint_name

    if mode in ("auto", "custom", "stock") and _use_flash(tq, tk, d):
        from jax.experimental.pallas.ops.tpu import flash_attention as fa

        o = fa.flash_attention(
            to_bhtd(q), to_bhtd(k), to_bhtd(v),
            sm_scale=sm_scale,
            block_sizes=_block_sizes(tq),
        )
        return checkpoint_name(o, "attn_out").transpose(0, 2, 1, 3)
    if bhtd:
        q, k, v = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    return checkpoint_name(jax.nn.dot_product_attention(q, k, v), "attn_out")
