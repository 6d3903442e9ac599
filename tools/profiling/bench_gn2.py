"""GN formulations in a conv->GN->silu->conv sandwich, fwd+bwd, scan-timed."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/lycoris_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from lycoris_tpu.functional import general
from lycoris_tpu.ops.group_norm import group_norm_dots

ITERS = 30
G = 32

def gn_jnp(x, gamma, beta):
    return general.group_norm(x, G, gamma, beta)

def gn_dots(x, gamma, beta):
    return group_norm_dots(x, G, gamma, beta, 1e-5)

def gn_none(x, gamma, beta):
    return x * gamma[None, :, None, None] + beta[None, :, None, None]

def make_fn(gn):
    def step(x, params):
        w1, b1, gamma, beta, w2, b2 = params
        def loss(x, params):
            w1, b1, gamma, beta, w2, b2 = params
            h = general.convnd(x, w1, b1, stride=1, padding=1)
            h = gn(h, gamma, beta)
            h = jax.nn.silu(h)
            h = general.convnd(h, w2, b2, stride=1, padding=1)
            return jnp.sum(h.astype(jnp.float32) ** 2) * 1e-9
        def body(c, _):
            l, (dx, dp) = jax.value_and_grad(loss, argnums=(0, 1))(c, params)
            return (c - (1e-6 + 0 * l) * dx).astype(c.dtype), None
        y, _ = jax.lax.scan(body, x, None, length=ITERS)
        return y
    return jax.jit(step)

def run(shape):
    n, c, h, w = shape
    k = jax.random.split(jax.random.key(0), 6)
    x = jax.random.normal(k[0], shape, jnp.bfloat16)
    params = (
        jax.random.normal(k[1], (c, c, 3, 3), jnp.bfloat16) * 0.02,
        jnp.zeros((c,), jnp.bfloat16),
        jnp.ones((c,), jnp.bfloat16),
        jnp.zeros((c,), jnp.bfloat16),
        jax.random.normal(k[2], (c, c, 3, 3), jnp.bfloat16) * 0.02,
        jnp.zeros((c,), jnp.bfloat16),
    )
    out = {}
    for name, gn in [("none", gn_none), ("jnp", gn_jnp), ("dots", gn_dots)]:
        f = make_fn(gn)
        o = f(x, params)
        float(jnp.sum(o.astype(jnp.float32)))
        t0 = time.perf_counter()
        REP = 3
        for _ in range(REP):
            o = f(o, params)
        float(jnp.sum(o.astype(jnp.float32)))
        out[name] = (time.perf_counter() - t0) / (REP * ITERS) * 1000
    mb = n * c * h * w * 2 / 1e6
    print(f"{shape}: none {out['none']:.3f} | jnp {out['jnp']:.3f} "
          f"(gn +{out['jnp']-out['none']:.3f}) | dots {out['dots']:.3f} "
          f"(gn +{out['dots']-out['none']:.3f})  [tensor {mb:.0f} MB]", flush=True)

for shape in [(4, 1280, 32, 32), (4, 640, 64, 64), (4, 320, 128, 128)]:
    run(shape)
