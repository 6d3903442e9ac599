"""Stacked-wrapper demo — multiple LyCORIS adapters composed on one model.

TPU-native analog of reference example/stacked_wrapper_demo.py: the
reference stacks wrappers by chaining patched ``module.forward``s
(base.py:271-287); here stacking composes flax interceptors, so the whole
stack stays one jit-traceable function. Each adapter's delta rides on top
of everything inside it (delta-over-base), so adapters trained separately
compose additively.

Run: python example/stacked_wrapper_demo.py [--train]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax


class DemoNet(nn.Module):
    """Names intentionally awkward (test_1 / te_2st / _3test) like the
    reference demo — exercises name mangling in lora_name generation."""

    @nn.compact
    def __call__(self, x):
        from lycoris_tpu.models import layers as L

        h = L.Linear(256, name="test_1")(x)
        h = jax.nn.mish(h)
        h = L.Linear(64, name="te_2st")(h)
        h = x + h
        return L.Linear(10, name="_3test")(h)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--train", action="store_true",
                        help="fit the second adapter on a toy objective")
    args = parser.parse_args()

    from lycoris_tpu import create_lycoris, ModelGraph

    rng = jax.random.key(0)
    model = DemoNet()
    x = jax.random.normal(rng, (16, 64))
    variables = model.init(jax.random.key(1), x)
    graph = ModelGraph.from_linen(model, variables, x)

    # two independent adapters of different algorithms
    k1, k2 = jax.random.split(rng)
    net_lora = create_lycoris(graph, 1.0, linear_dim=8, linear_alpha=4.0,
                              algo="lora", rng=k1)
    net_lokr = create_lycoris(graph, 1.0, linear_dim=8, linear_alpha=4.0,
                              algo="lokr", factor=4, rng=k2)
    for net, key in ((net_lora, k1), (net_lokr, k2)):
        tree = net.params_tree()
        for ln, p in tree.items():
            for k in list(p):
                if k in net.lora_map[ln].trainable:
                    key, sub = jax.random.split(key)
                    p[k] = p[k] + jax.random.normal(sub, p[k].shape, p[k].dtype) * 0.02
        net.set_params_tree(tree)

    base = model.apply(variables, x)
    out1 = net_lora(variables, x, model=model)
    out2 = net_lokr(variables, x, model=model)

    # stacked forward: compose the two interceptors
    with nn.intercept_methods(net_lora.interceptor()), \
         nn.intercept_methods(net_lokr.interceptor()):
        stacked = model.apply(variables, x)

    d1 = np.abs(np.asarray(out1 - base)).max()
    d2 = np.abs(np.asarray(out2 - base)).max()
    d12 = np.abs(np.asarray(stacked - base)).max()
    add = np.abs(np.asarray(stacked - base) - np.asarray(out1 - base)
                 - np.asarray(out2 - base)).max()
    print(f"|lora delta|   = {d1:.5f}")
    print(f"|lokr delta|   = {d2:.5f}")
    print(f"|stack delta|  = {d12:.5f}")
    print(f"|stack - (lora+lokr)| = {add:.2e}  (additive within 2nd-order terms)")

    if args.train:
        # fit ONLY the lokr adapter while the lora adapter stays frozen in
        # the stack — its params are just another jit argument
        target = jax.random.normal(jax.random.key(7), (16, 10))

        def loss_fn(lokr_tree, lora_tree):
            with nn.intercept_methods(net_lora.interceptor(adapter_params=lora_tree)), \
                 nn.intercept_methods(net_lokr.interceptor(adapter_params=lokr_tree)):
                pred = model.apply(variables, x)
            return jnp.mean((pred - target) ** 2)

        opt = optax.adam(1e-2)
        lokr_tree = net_lokr.params_tree()
        lora_tree = net_lora.params_tree()
        state = opt.init(lokr_tree)
        step = jax.jit(lambda t, s: _step(t, s, lora_tree, loss_fn, opt))
        for i in range(20):
            lokr_tree, state, loss = step(lokr_tree, state)
        print(f"trained stacked lokr 20 steps, loss {float(loss):.4f}")
        net_lokr.set_params_tree(jax.device_get(lokr_tree))


def _step(tree, state, frozen, loss_fn, opt):
    loss, grads = jax.value_and_grad(loss_fn)(tree, frozen)
    updates, state = opt.update(grads, state)
    return optax.apply_updates(tree, updates), state, loss


if __name__ == "__main__":
    main()
