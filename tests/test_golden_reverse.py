"""Reverse-direction golden tests: files WE write must load in the PyTorch
reference and merge to the same weights (≤ 1e-3, BASELINE gate) — the forward
direction lives in test_golden_files.py; together they pin the checkpoint
format from both sides for every algorithm.

Exclusions (reference-side crashes, each reproduced here):
- ia3: the reference's ``IA3Module.make_module_from_state_dict`` passes the
  wrong arity (modules/ia3.py:121-127 takes (up, alpha) but the loader sends
  (weight, on_input)) → its loader cannot read ANY ia3 file, ours or its own.
  We pin the format instead by asserting our key set == the reference
  module's own ``state_dict()`` key grammar.
- norm: same-style key-grammar pin (reference ships no ``norms`` branch in
  ``create_lycoris_from_weights``' name scan — norm modules load only through
  kohya's dual-prefix path).
"""

import numpy as np
import pytest
import torch

import jax

from lycoris_tpu import ModelGraph, create_lycoris
from lycoris_tpu.wrapper import LycorisNetwork


@pytest.fixture(autouse=True)
def reset_preset():
    yield
    LycorisNetwork.reset_preset()


def _torch_model():
    import torch.nn as tnn

    class Tiny(tnn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = tnn.Linear(32, 64)
            self.fc2 = tnn.Linear(64, 32)
            self.conv = tnn.Conv2d(16, 32, 3, 1, 1)
            self.pw = tnn.Conv2d(32, 32, 1)

    return Tiny()


@pytest.mark.parametrize(
    "algo,kwargs",
    [
        ("lora", {}),
        ("lora", {"use_tucker": True}),
        ("lora", {"dora_wd": True}),
        ("loha", {}),
        ("lokr", {"factor": 4}),
        ("lokr", {"factor": -1, "decompose_both": True}),
        ("diag-oft", {}),
        ("boft", {}),
        ("glora", {}),
        ("full", {}),
        # dylora saves as LoCon (reference dylora.py:84-95) with a 2-D
        # lora_up even for convs (up blocks are (out, block_size),
        # dylora.py:62-64) — the reference's OWN LoCon loader crashes on that
        # conv layout (locon.py:176 copy_ broadcast), so the conv case is a
        # reference-crashing load; round-trip the linear-only model instead.
        ("dylora", {"linear_only": True}),
    ],
)
def test_our_file_loads_in_reference(algo, kwargs, ref, tmp_path):
    from lycoris import create_lycoris_from_weights as ref_from_weights

    kwargs = dict(kwargs)
    linear_only = kwargs.pop("linear_only", False)
    torch.manual_seed(0)
    t_model = _torch_model()
    if linear_only:
        del t_model.conv
        del t_model.pw
    base_sd = {k: v.detach().clone() for k, v in t_model.state_dict().items()}

    graph = ModelGraph.from_torch(t_model)
    rng = jax.random.key(7)
    j_net = create_lycoris(
        graph, 1.0, linear_dim=4, linear_alpha=4.0, algo=algo,
        preset="full", rng=rng, **kwargs,
    )
    # noise trainable params so the merge delta is nonzero
    key = jax.random.key(11)
    tree = j_net.params_tree()
    for ln, sub in tree.items():
        mod = j_net.lora_map[ln]
        for k in mod.trainable:
            key, s = jax.random.split(key)
            tree[ln][k] = tree[ln][k] + jax.random.normal(
                s, tree[ln][k].shape, tree[ln][k].dtype) * 0.02
    j_net.set_params_tree(tree)

    f = str(tmp_path / "ours.safetensors")
    j_net.save_weights(f, dtype=np.float32, metadata={})

    if algo == "dylora":
        # dylora files ARE LoCon files (raw factors + alpha); their merge
        # semantics are LoCon's alpha/dim, not the live module's
        # alpha/block_count (reference dylora.py:97-110 quirk). Compare both
        # frameworks' interpretation of the same file.
        from lycoris_tpu import create_lycoris_from_weights

        j_net, _ = create_lycoris_from_weights(1.0, f, graph)

    # ours: merged weights
    merged_trees = j_net.merge_to(1.0)
    ours = {
        node.name: np.asarray(merged_trees[node.name]["weight"])
        for _, node in j_net.node_map.items()
    }

    # reference: load OUR file onto the pristine torch model and merge
    r_net, _ = ref_from_weights(1.0, f, t_model)
    assert len(r_net.loras) == len(j_net.loras), (
        f"reference loaded {len(r_net.loras)} of our {len(j_net.loras)} modules"
    )
    # apply→restore→merge: the only reference sequence that merges every
    # algo — a from_weights FullModule keeps is_diff=True and its
    # make_weight then trips over the org_bias list (full.py:155-161);
    # apply_to folds the diff into an absolute weight and restore()
    # reinstates the torch params it deleted
    r_net.apply_to()
    r_net.restore()
    r_net.merge_to(1.0)
    for name, got in ours.items():
        want = dict(t_model.named_modules())[name].weight.detach().numpy()
        max_d = np.max(np.abs(got - want))
        assert max_d <= 1e-3, f"{algo} {name}: max|Δ|={max_d}"  # BASELINE gate
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    t_model.load_state_dict(base_sd)


def _key_grammar(algo, ref, train_norm=False):
    """Build the same net in both frameworks; return (our_keys, ref_keys)."""
    from lycoris import create_lycoris as ref_create

    torch.manual_seed(0)
    t_model = _torch_model()
    if train_norm:
        import torch.nn as tnn

        t_model.norm = tnn.LayerNorm(32)
        t_model.gn = tnn.GroupNorm(4, 32)
    kwargs = dict(linear_dim=4, linear_alpha=4.0, preset="full")
    if train_norm:
        kwargs["train_norm"] = True
    r_net = ref_create(t_model, 1.0, algo=algo, **kwargs)
    r_net.apply_to()
    ref_keys = set(r_net.state_dict().keys())
    LycorisNetwork.reset_preset()

    graph = ModelGraph.from_torch(t_model)
    j_net = create_lycoris(graph, 1.0, algo=algo, rng=jax.random.key(0), **kwargs)
    our_keys = set(j_net.state_dict().keys())
    return our_keys, ref_keys


def test_ia3_key_grammar_matches_reference(ref):
    """ia3 is absent from the reference's ``create_lycoris`` algo dict
    (wrapper.py:45-55, kohya-only) and its loader can't read ia3 files at all
    (make_module_from_state_dict arity bug, ia3.py:78-86 takes one weight but
    weight_list sends two) — pin the FORMAT by module-level key identity."""
    from lycoris.modules.ia3 import IA3Module as RefIA3

    from lycoris_tpu.modules import IA3Module, LayerInfo

    for train_on_input in (False, True):
        t_lin = torch.nn.Linear(32, 64)
        rmod = RefIA3("lora_te_x", t_lin, 1.0, lora_dim=4, alpha=1.0,
                      train_on_input=train_on_input)
        theirs = set(rmod.state_dict().keys())
        jmod = IA3Module(
            "lora_te_x", LayerInfo.linear(64, 32), 1.0, lora_dim=4, alpha=1.0,
            rng=jax.random.key(0),
            org_weight=jnp_from_torch(t_lin.weight),
            train_on_input=train_on_input,
        )
        ours = set(jmod.custom_state_dict().keys())
        assert ours == theirs, (train_on_input, ours, theirs)
        # shapes pin the layout too
        for k in ours:
            assert tuple(jmod.custom_state_dict()[k].shape) == tuple(
                rmod.state_dict()[k].shape
            ), k

    # demonstrate the reference-side loader crash is real (so the exclusion
    # from the file round-trip matrix above stays honest)
    from lycoris import create_lycoris_from_weights as ref_from_weights

    t_model = _torch_model()
    sd = {
        "lycoris_fc1.weight": torch.zeros(64),
        "lycoris_fc1.on_input": torch.tensor(0),
    }
    with pytest.raises(TypeError):
        ref_from_weights(1.0, "", t_model, weights_sd=sd)


def jnp_from_torch(p):
    import jax.numpy as jnp

    return jnp.asarray(p.detach().numpy())


def test_norm_key_grammar_matches_reference(ref):
    ours, theirs = _key_grammar("lora", ref, train_norm=True)
    norm_ours = {k for k in ours if "w_norm" in k or "b_norm" in k}
    norm_theirs = {k for k in theirs if "w_norm" in k or "b_norm" in k}
    assert norm_ours and norm_ours == norm_theirs
    assert ours == theirs
