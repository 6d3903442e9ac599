"""Conv backward-input (dX) A/B at the UNet's 3x3 shapes (VERDICT r5 task 2).

The SDXL roofline puts the fused conv+matmul bucket at ~449 ms vs a 337.6 ms
floor, with conv-backward named as the inefficient slice (base convs are
frozen, so dW is DCE'd and dX is the whole conv backward). This measures,
per shape, fwd + dX time for:

  autodiff   — production path: lax.conv_general_dilated fwd, dX via jax vjp
               (XLA's backward-input conv: rev(W), IOHW dims)
  gemm_taps  — dX as k*k dense [N*H*W, O] x [O, I] GEMMs over shifted views
               of padded dy, accumulated in (N, H, W, I), one transpose back
               to NCHW at the end (the dX analogue of CONV_DW=shifts)
  nhwc       — fwd + autodiff dX entirely in NHWC/HWIO (XLA TPU's preferred
               conv layout), no boundary transposes counted — an upper bound
               for what a channels-last activation layout would buy

Scan-timed (ITERS chained applies inside one jit) on the real chip.
Usage: python tools/profiling/bench_conv_dx.py [sd15|sdxl|all]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/lycoris_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

ITERS = int(os.environ.get("CONV_ITERS", "20"))

SHAPES = {
    "sdxl": [
        # (N, C_in, H, W, C_out) — b4 @1024px latents
        (4, 1280, 32, 32, 1280),
        (4, 2560, 32, 32, 1280),   # up-block skip-concat conv
        (4, 640, 64, 64, 640),
        (4, 1280, 64, 64, 640),    # up-block channel-drop conv
        (4, 320, 128, 128, 320),
    ],
    "sd15": [
        (8, 320, 64, 64, 320),
        (8, 640, 32, 32, 640),
        (8, 1280, 16, 16, 1280),
        (8, 1280, 8, 8, 1280),
    ],
}


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def make_autodiff(w):
    def step(x, dy):
        def body(c, _):
            def f(xx):
                dn = lax.conv_dimension_numbers(xx.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
                return lax.conv_general_dilated(
                    xx, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
            y, pb = jax.vjp(f, c)
            (dx,) = pb(dy)
            return (c + 1e-6 * dx + 1e-9 * jnp.mean(y)).astype(c.dtype), None
        out, _ = lax.scan(body, x, None, length=ITERS)
        return out
    return jax.jit(step)


def make_gemm_taps(w):
    o_, i_, kh, kw = w.shape

    def step(x, dy):
        n, _, h, wd = x.shape

        def body(c, _):
            dn = lax.conv_dimension_numbers(c.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
            y = lax.conv_general_dilated(c, w, (1, 1), [(1, 1), (1, 1)],
                                         dimension_numbers=dn)
            # dX: dx[n,i,p,q] = sum_{o,ki,kj} dy[n,o,p+1-ki,q+1-kj] W[o,i,ki,kj]
            dyp = jnp.pad(dy, ((0, 0), (0, 0), (kh - 2, kh - 2), (kw - 2, kw - 2)))
            acc = None
            for ki in range(kh):
                for kj in range(kw):
                    ds = lax.slice(
                        dyp, (0, 0, kh - 1 - ki, kw - 1 - kj),
                        (n, o_, kh - 1 - ki + h, kw - 1 - kj + wd))
                    # (N,O,H,W) x (O,I) -> (N,H,W,I)
                    t = lax.dot_general(
                        ds, w[:, :, ki, kj],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = t if acc is None else acc + t
            dx = acc.transpose(0, 3, 1, 2).astype(c.dtype)
            return (c + 1e-6 * dx + 1e-9 * jnp.mean(y)).astype(c.dtype), None

        out, _ = lax.scan(body, x, None, length=ITERS)
        return out
    return jax.jit(step)


def make_nhwc(w_hwio):
    def step(x, dy):  # x, dy in NHWC
        def body(c, _):
            def f(xx):
                dn = lax.conv_dimension_numbers(xx.shape, w_hwio.shape,
                                                ("NHWC", "HWIO", "NHWC"))
                return lax.conv_general_dilated(
                    xx, w_hwio, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
            y, pb = jax.vjp(f, c)
            (dx,) = pb(dy)
            return (c + 1e-6 * dx + 1e-9 * jnp.mean(y)).astype(c.dtype), None
        out, _ = lax.scan(body, x, None, length=ITERS)
        return out
    return jax.jit(step)


def run(n, ci, h, wd, co):
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (n, ci, h, wd), jnp.bfloat16)
    dy = jax.random.normal(k2, (n, co, h, wd), jnp.bfloat16)
    w = jax.random.normal(k3, (co, ci, 3, 3), jnp.bfloat16) * 0.02
    flops_fwd = 2 * n * h * wd * ci * co * 9
    res = {}
    cases = {
        "autodiff": (make_autodiff(w), x, dy),
        "gemm_taps": (make_gemm_taps(w), x, dy),
        "nhwc": (make_nhwc(w.transpose(2, 3, 1, 0)),
                 x.transpose(0, 2, 3, 1), dy.transpose(0, 2, 3, 1)),
    }
    only = os.environ.get("CONV_CASES")
    for name, (f, xx, dyy) in cases.items():
        if only and name not in only.split(","):
            continue
        _sync(f(xx, dyy))  # compile + warm
        t0 = time.perf_counter()
        _sync(f(xx, dyy))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        # fwd + dX = 2x fwd FLOPs
        util = 2 * flops_fwd / (dt / 1e3) / 197e12
        res[name] = (dt, util)
        print(f"  {name:10s} {dt:7.3f} ms/apply  util={util*100:5.1f}%", flush=True)
    return res


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    groups = SHAPES if which == "all" else {which: SHAPES[which]}
    print(f"[conv_dx] backend={jax.default_backend()} iters={ITERS}", flush=True)
    for gname, shapes in groups.items():
        for (n, ci, h, wd, co) in shapes:
            print(f"[{gname}] N{n} {ci}->{co} @{h}x{wd}:", flush=True)
            run(n, ci, h, wd, co)


if __name__ == "__main__":
    main()
