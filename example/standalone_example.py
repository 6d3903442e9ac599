"""Standalone usage demo — TPU-native analog of the reference
example/standalone_example.py (BASELINE config #1): wrap a toy MLP with two
stacked LoKr networks, train them jointly with optax on a synthetic task,
save/merge.

Run: python example/standalone_example.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from lycoris_tpu import LycorisNetwork, ModelGraph, create_lycoris
from lycoris_tpu.models import layers as L


class DemoNet(nn.Module):
    """A simple flax module for demo (matches the reference DemoNet)."""

    @nn.compact
    def __call__(self, x):
        h = L.Linear(2048, name="test_1")(x)
        h = jax.nn.mish(h)
        h = L.Linear(784, name="te_2st")(h)
        h = x + h
        return L.Linear(10, name="_3test")(h)


def main():
    rng = jax.random.key(0)
    model = DemoNet()
    x = jnp.zeros((32, 784))
    variables = model.init(rng, x)
    graph = ModelGraph.from_linen(model, variables, x)

    # two stacked adapter networks targeting different layers by regex
    LycorisNetwork.apply_preset({"target_name": [".*te.*"]})
    net1 = create_lycoris(graph, 1.0, linear_dim=16, linear_alpha=2.0, algo="lokr", rng=rng)
    LycorisNetwork.apply_preset({"target_name": [".*es.*"]})
    net2 = create_lycoris(graph, 1.0, linear_dim=16, linear_alpha=2.0, algo="lokr",
                          rng=jax.random.fold_in(rng, 1))
    LycorisNetwork.reset_preset()

    print(f"#Modules of net1: {len(net1.loras)}")
    print(f"#Modules of net2: {len(net2.loras)}")

    def count(tree):
        return sum(x.size for x in jax.tree_util.tree_leaves(tree))

    print("Total params:", count(variables))
    print("Net1 Params:", count(net1.trainable_params()))
    print("Net2 Params:", count(net2.trainable_params()))

    # joint training of both adapter trees on a synthetic classification task
    params = {"n1": net1.trainable_params(), "n2": net2.trainable_params()}
    opt = optax.adamw(5e-3)
    opt_state = opt.init(params)

    full1, full2 = net1.params_tree(), net2.params_tree()

    def forward(p, x):
        t1 = {k: {**full1[k], **v} for k, v in p["n1"].items()}
        t2 = {k: {**full2[k], **v} for k, v in p["n2"].items()}
        with nn.intercept_methods(net1.interceptor(t1)), nn.intercept_methods(net2.interceptor(t2)):
            return model.apply(variables, x)

    @jax.jit
    def step(p, opt_state, x, y):
        def loss_fn(p):
            logits = forward(p, x)
            return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt_state = opt.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    data_rng = jax.random.key(42)
    for i in range(50):
        kx, ky, data_rng = jax.random.split(data_rng, 3)
        xb = jax.random.normal(kx, (32, 784))
        yb = (jnp.abs(xb[:, :10]).argmax(-1)).astype(jnp.int32)
        params, opt_state, loss = step(params, opt_state, xb, yb)
        if i % 10 == 0:
            print(f"step {i}: loss {float(loss):.4f}")

    # save + merge
    net1.set_params_tree({k: {**full1[k], **v} for k, v in params["n1"].items()})
    net1.save_weights("/tmp/demo_lokr.safetensors", metadata={})
    merged = net1.merge_to(1.0)
    print("saved /tmp/demo_lokr.safetensors; merged param tree keys:", list(merged)[:3])


if __name__ == "__main__":
    main()
