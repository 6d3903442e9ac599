"""Microbench: (a) BOFT butterfly bypass — dense-Q matmul vs streamed chain
(settles VERDICT r2 #6 with numbers: the bypass path now applies as ONE dense
MXU matmul via functional.boft.dense_rotation); (b) GroupNorm fwd+bwd variants
(jnp reshape-free vs dots custom_vjp) at the SD1.5/SDXL resnet shapes, against
their HBM roofline.

Run on the one real TPU chip: `timeout 1200 python tools/profiling/bench_boft_gn.py`.
"""

import functools
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/lycoris_jax_cache")


def timeit(fn, *args, iters=50, warmup=5):
    jitted = jax.jit(fn)
    for _ in range(warmup):
        out = jitted(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    # pull a scalar to really sync (axon block_until_ready is optimistic)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    s = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.ravel(s)[0])
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def bench_boft():
    from lycoris_tpu.functional import boft
    from lycoris_tpu.functional.diag_oft import get_r

    print("== BOFT bypass: dense Q matmul vs streamed chain ==")
    for m_, dim, M in ((6, 320, 32768), (7, 640, 8192)):
        b = 10
        num = dim // b
        key = jax.random.key(0)
        blocks = jax.random.normal(key, (m_, num, b, b), jnp.float32) * 0.01
        x = jax.random.normal(key, (M, dim), jnp.bfloat16)

        def dense_apply(x, blocks):
            r = get_r(blocks, jnp.eye(b, dtype=blocks.dtype), None)
            q = boft.dense_rotation(r).astype(x.dtype)
            return x @ q.T

        def chain_apply(x, blocks):
            r = get_r(blocks, jnp.eye(b, dtype=blocks.dtype), None)
            return boft._chain(x.T.astype(r.dtype), r).T.astype(x.dtype)

        def base_mm(x, w):
            return x @ w

        w = jax.random.normal(key, (dim, dim), jnp.bfloat16)
        t_dense = timeit(dense_apply, x, blocks)
        t_chain = timeit(chain_apply, x, blocks)
        t_base = timeit(base_mm, x, w)
        print(f"m={m_} dim={dim} M={M}: dense {t_dense:.3f} ms  "
              f"chain {t_chain:.3f} ms  base-matmul {t_base:.3f} ms")


def bench_gn():
    import os
    from lycoris_tpu.functional import general
    from lycoris_tpu.ops.group_norm import group_norm_dots

    print("== GroupNorm fwd+bwd: jnp vs dots (loss = sum(silu(gn(x)))) ==")
    for n, c, hw in ((8, 320, 64), (8, 640, 32), (8, 1280, 16),
                     (4, 640, 128), (4, 1280, 64), (4, 1280, 32)):
        key = jax.random.key(1)
        x = jax.random.normal(key, (n, c, hw, hw), jnp.bfloat16)
        w = jnp.ones((c,), jnp.float32)
        b = jnp.zeros((c,), jnp.float32)

        def gn_barrier(x, num_groups, w, b, eps=1e-5):
            """jnp form but with the stats pass split from the producer via an
            optimization barrier — tests whether the multi-output (act, s1, s2)
            fusions' iteration-space conflict is the 24-50x-off-roofline
            pathology seen in the step profiles."""
            import math as _m
            from jax import lax
            n_, c_, *sp = x.shape
            cg = c_ // num_groups
            xb = jax.lax.optimization_barrier(x)
            xf = xb.astype(jnp.float32)
            s1 = jnp.sum(xf, axis=tuple(range(2, x.ndim)))
            s2 = jnp.sum(xf * xf, axis=tuple(range(2, x.ndim)))
            cnt = cg * _m.prod(sp)
            gs1 = jnp.sum(s1.reshape(n_, num_groups, cg), axis=2)
            gs2 = jnp.sum(s2.reshape(n_, num_groups, cg), axis=2)
            mean_g = gs1 / cnt
            rstd_g = lax.rsqrt(gs2 / cnt - mean_g * mean_g + eps)
            rep = lambda a: jnp.repeat(a, cg, axis=1)
            scale_c = rep(rstd_g) * w.astype(jnp.float32)[None]
            shift_c = rep(-mean_g * rstd_g) * w.astype(jnp.float32)[None] + b.astype(jnp.float32)[None]
            exp = (n_, c_, *[1] * len(sp))
            return (x.astype(jnp.float32) * scale_c.reshape(exp) + shift_c.reshape(exp)).astype(x.dtype)

        def loss_jnp(x, w, b):
            os.environ["LYCORIS_TPU_GN"] = "auto"
            y = general.group_norm(x, 32, w, b)
            return jnp.sum(jax.nn.silu(y).astype(jnp.float32))

        def loss_dots(x, w, b):
            y = group_norm_dots(x, 32, w, b, 1e-5)
            return jnp.sum(jax.nn.silu(y).astype(jnp.float32))

        def loss_barrier(x, w, b):
            y = gn_barrier(x, 32, w, b)
            return jnp.sum(jax.nn.silu(y).astype(jnp.float32))

        def loss_v2(x, w, b):
            from lycoris_tpu.ops.group_norm_v2 import group_norm_act

            y = group_norm_act(x, 32, w, b, act="silu")
            return jnp.sum(y.astype(jnp.float32))

        gj = jax.grad(loss_jnp)
        gd = jax.grad(loss_dots)
        gb = jax.grad(loss_barrier)
        g2 = jax.grad(loss_v2)
        t_j = timeit(gj, x, w, b)
        t_d = timeit(gd, x, w, b)
        t_b = timeit(gb, x, w, b)
        t_2 = timeit(g2, x, w, b)
        bytes_min = x.size * 2 * 5  # fwd r+w, bwd 2r+w
        roof = bytes_min / 819e9 * 1e3
        print(f"({n},{c},{hw}²): jnp {t_j:.3f} ms  dots {t_d:.3f} ms  "
              f"barrier {t_b:.3f} ms  v2(fused silu) {t_2:.3f} ms  "
              f"~roofline {roof:.3f} ms")


if __name__ == "__main__":
    bench_boft()
    bench_gn()
