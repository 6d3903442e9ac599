"""Flash dt (D-major) vs standard kernel, in a projection sandwich, fwd+bwd.

Measures the full boundary cost: head_split projections -> attention ->
out projection, scan-timed, at the two SDXL self-attention operating points.
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/lycoris_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from lycoris_tpu.functional import general
from lycoris_tpu.ops.attention import dot_product_attention as dpa

ITERS = 30


def make_step(h, dhead, dt_flag):
    def step(x, params):
        def loss(x, params):
            wq, wk, wv, wo = params
            os.environ["LYCORIS_TPU_FLASH_DT"] = dt_flag
            q = general.linear_head_split(x, wq, None, h, dhead)
            k = general.linear_head_split(x, wk, None, h, dhead)
            v = general.linear_head_split(x, wv, None, h, dhead)
            o = dpa(q, k, v, layout="BHTD")  # (B, T, H, D)
            o = o.reshape(*o.shape[:-2], -1)
            y = general.linear(o, wo, None)
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-9

        def body(c, _):
            l, (dx, dp) = jax.value_and_grad(loss, argnums=(0, 1))(c, params)
            return (c - (1e-6 + 0 * l) * dx).astype(c.dtype), None

        y, _ = jax.lax.scan(body, x, None, length=ITERS)
        return y

    return jax.jit(step)


def run(b, t, heads, dhead):
    c = heads * dhead
    ks = jax.random.split(jax.random.key(0), 5)
    x = jax.random.normal(ks[0], (b, t, c), jnp.bfloat16)
    params = tuple(
        jax.random.normal(k, (c, c), jnp.bfloat16) * 0.02 for k in ks[1:]
    )
    out = {}
    for name, flag in [("std", "0"), ("dt", "1")]:
        f = make_step(heads, dhead, flag)
        o = f(x, params)
        float(jnp.sum(o.astype(jnp.float32)))
        t0 = time.perf_counter()
        REP = 3
        for _ in range(REP):
            o = f(o, params)
        float(jnp.sum(o.astype(jnp.float32)))
        out[name] = (time.perf_counter() - t0) / (REP * ITERS) * 1000
    print(
        f"B{b} T{t} H{heads} D{dhead}: std {out['std']:.3f} ms | dt {out['dt']:.3f} ms "
        f"({(out['std'] - out['dt']) / out['std'] * 100:+.1f}%)",
        flush=True,
    )


run(4, 1024, 20, 64)   # SDXL 32x32 level
run(4, 4096, 10, 64)   # SDXL 64x64 level
