"""Conv speed-of-light microbench at SD1.5 UNet shapes (b8, v5e-1).

The SD1.5 step profile attributes 66 ms to "conv/matmul fusions at ~58% MXU"
(docs/Guidelines.md "Profile state").  This bench isolates what the hardware
actually achieves on each conv shape in the UNet, split by pass:

  fwd  — the forward convolution
  dx   — the backward-input conv (vjp wrt x; the only backward conv the
         attn-mlp bench needs: base convs are frozen so XLA DCEs dW)
  dw   — the filter gradient (matters for full presets / train_conv)

against the v5e bf16 MXU peak (197 TFLOP/s), plus a big-GEMM calibration row
showing what peak the chip really reaches.  Stride-2 rows matter most: XLA
lowers their dx as an lhs-dilated conv (zero-inserted), which can waste 4x
MXU work — if util is low there, a polyphase decomposition is the fix.

Run: `timeout 1800 python tools/profiling/bench_conv.py`  (one TPU job!)
"""

import time

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/lycoris_jax_cache")

PEAK = 197e12  # v5e bf16 FLOP/s


def timeit(fn, *args, iters=30, warmup=3):
    jitted = jax.jit(fn)
    for _ in range(warmup):
        out = jitted(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    s = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.ravel(s)[0])  # real sync (axon block_until_ready optimistic)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def conv(x, w, stride):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(1, 1), (1, 1)] if w.shape[-1] == 3 else [(0, 0), (0, 0)],
        dimension_numbers=dn,
    )


def main():
    print(f"devices: {jax.devices()}")
    k0 = jax.random.key(0)

    # calibration: what fraction of 197T does a big square GEMM reach?
    m = 8192
    a = jax.random.normal(k0, (m, m), jnp.bfloat16)
    t = timeit(lambda a: a @ a, a)
    fl = 2 * m**3
    print(f"calib gemm {m}^3 bf16: {t:.3f} ms  {fl/t*1e3/1e12:.1f} TF/s "
          f"({fl/t*1e3/PEAK*100:.0f}% peak)")

    B = 8
    # (label, Cin, Cout, H(in), k, stride)  — SD1.5 UNet@64 latent, b8
    shapes = [
        ("64^2 320->320 k3", 320, 320, 64, 3, 1),
        ("32^2 640->640 k3", 640, 640, 32, 3, 1),
        ("16^2 1280->1280 k3", 1280, 1280, 16, 3, 1),
        ("8^2 1280->1280 k3", 1280, 1280, 8, 3, 1),
        ("64^2 320->320 k1", 320, 320, 64, 1, 1),
        ("down 64->32 s2 320", 320, 320, 64, 3, 2),
        ("down 32->16 s2 640", 640, 640, 32, 3, 2),
        ("down 16->8 s2 1280", 1280, 1280, 16, 3, 2),
    ]
    print(f"{'shape':24} {'pass':4} {'ms':>8} {'TF/s':>7} {'%peak':>6}")
    for label, ci, co, h, k, s in shapes:
        x = jax.random.normal(k0, (B, ci, h, h), jnp.bfloat16)
        w = jax.random.normal(k0, (co, ci, k, k), jnp.bfloat16) * 0.02
        ho = h // s
        ct = jax.random.normal(k0, (B, co, ho, ho), jnp.bfloat16)
        fl = 2 * B * ho * ho * co * ci * k * k

        f = lambda x, w: conv(x, w, s)
        t_fwd = timeit(f, x, w)

        def dx_only(ct):
            _, vjpf = jax.vjp(lambda x_: f(x_, w), x)
            return vjpf(ct)[0]

        def dw_only(ct):
            _, vjpf = jax.vjp(lambda w_: f(x, w_), w)
            return vjpf(ct)[0]

        t_dx = timeit(dx_only, ct)
        t_dw = timeit(dw_only, ct)
        for name, tt in (("fwd", t_fwd), ("dx", t_dx), ("dw", t_dw)):
            print(f"{label:24} {name:4} {tt:8.3f} {fl/tt*1e3/1e12:7.1f} "
                  f"{fl/tt*1e3/PEAK*100:6.1f}")


if __name__ == "__main__":
    main()
