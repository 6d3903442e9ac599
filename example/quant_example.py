"""QLyCORIS demo — analog of reference example/bnb_example.py: adapters over
an int8 weight-only quantized base (bypass mode is forced automatically so
ΔW never touches the quantized weight).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import flax.linen as nn

from lycoris_tpu import ModelGraph, create_lycoris
from lycoris_tpu.models import layers as L
from lycoris_tpu.utils.quant import Int8Linear, quantize_linear_params


class FloatNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = L.Linear(256, name="fc1")(x)
        h = jax.nn.silu(h)
        return L.Linear(128, name="fc2")(h)


class QuantNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = Int8Linear(256, name="fc1")(x)
        h = jax.nn.silu(h)
        return Int8Linear(128, name="fc2")(h)


def main():
    rng = jax.random.key(0)
    x = jax.random.normal(rng, (2, 128), jnp.bfloat16)

    fnet = FloatNet()
    fvars = fnet.init(jax.random.key(1), x)

    # quantize the float params into the Int8Linear layout
    qparams = {name: quantize_linear_params(sub) for name, sub in fvars["params"].items()}
    qnet = QuantNet()
    qvars = {"params": qparams}

    graph = ModelGraph.from_linen(qnet, qvars, x)
    net = create_lycoris(graph, 1.0, linear_dim=8, linear_alpha=4.0, algo="lokr", rng=rng)
    print("bypass forced:", all(l.bypass_mode for l in net.loras))

    out_q = qnet.apply(qvars, x)
    out_f = fnet.apply(fvars, x)
    err = float(jnp.max(jnp.abs(out_q.astype(jnp.float32) - out_f.astype(jnp.float32))))
    print(f"int8 vs fp base max err: {err:.4f}")

    out_adapted = net(qvars, x)
    print("adapted output shape:", out_adapted.shape)


if __name__ == "__main__":
    main()
