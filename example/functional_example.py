"""Functional API demo — analog of reference example/functional_example.py.

Stateless weight_gen / diff_weight / bypass_forward_diff, no modules, no
wrapper: both paths must agree (the core parity invariant).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from lycoris_tpu.functional import loha, lokr
from lycoris_tpu.functional.general import linear


def main():
    rng = jax.random.key(0)
    w = jax.random.normal(rng, (128, 128)) * 0.02

    # Call the Functional API to get weights (explicit PRNG keys, shapes)
    lokr_weights = lokr.weight_gen(jax.random.fold_in(rng, 1), w.shape, rank=4)
    loha_weights = loha.weight_gen(jax.random.fold_in(rng, 2), w.shape, rank=4, tucker=False)
    # noise the zero-init factors so the adapters actually do something
    lokr_weights = tuple(None if x is None else x + 0.01 for x in lokr_weights)
    loha_weights = tuple(None if x is None else x + 0.01 for x in loha_weights)

    x = jax.random.normal(jax.random.fold_in(rng, 3), (1, 128))
    out = linear(x, w)

    # two ways to apply each algorithm
    out_lokr_bypass = out + lokr.bypass_forward_diff(x, out, *lokr_weights)
    out_loha_bypass = out + loha.bypass_forward_diff(x, out, *loha_weights)
    out_lokr_rebuilt = linear(x, w + lokr.diff_weight(*lokr_weights))
    out_loha_rebuilt = linear(x, w + loha.diff_weight(*loha_weights))

    print("lokr bypass == rebuilt:", float(jnp.max(jnp.abs(out_lokr_bypass - out_lokr_rebuilt))))
    print("loha bypass == rebuilt:", float(jnp.max(jnp.abs(out_loha_bypass - out_loha_rebuilt))))


if __name__ == "__main__":
    main()
