"""SVD extraction toolchain — TPU-native (XLA batched SVD).

Reference contract: lycoris/utils/__init__.py:52-353
(``extract_linear``/``extract_conv``/``extract_diff``/``make_sparse``):
- rank modes: fixed | threshold | ratio | quantile(percentile) | full, with
  the fall-back-to-full rule when rank ≥ out/2;
- conv extraction reshapes (O,I,kh,kw)→(O,I·kh·kw), A=Vh, B=U·diag(S);
- optional CP second pass ("small_conv") producing ``lora_mid``;
- optional sparse-bias residual stored as COO ``bias_indices/values/size``;
- norm/full layers stored as ``w_norm/b_norm`` / ``diff/diff_b``;
- emits fp16 state-dict values under the reference key grammar.

TPU-native change: instead of one SVD per layer in a Python loop, layers are
grouped by delta shape and decomposed with a **vmapped batched SVD** on
device (the "XLA batched SVD" north-star item); the data-dependent rank
selection stays host-side exactly like the reference (it sizes the output
arrays, so it cannot be traced).
"""

from __future__ import annotations

from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import ModelGraph
from ..logging import logger


def make_sparse(t: np.ndarray, sparsity: float = 0.95) -> np.ndarray:
    abs_t = np.abs(t)
    quan = float(np.quantile(abs_t, sparsity))
    out = np.where(abs_t < quan, 0, t)
    return out


def _select_rank(S: np.ndarray, mode: str, mode_param) -> int:
    if mode == "fixed":
        return int(mode_param)
    if mode == "threshold":
        assert mode_param >= 0
        return int(np.sum(S > mode_param))
    if mode == "ratio":
        assert 1 >= mode_param >= 0
        return int(np.sum(S > S.max() * mode_param))
    if mode in ("quantile", "percentile"):
        assert 1 >= mode_param >= 0
        s_cum = np.cumsum(S)
        return int(np.sum(s_cum < mode_param * S.sum()))
    raise NotImplementedError('Extract mode should be "fixed", "threshold", "ratio" or "quantile"')


def _svd(w2d: jnp.ndarray):
    U, S, Vh = jnp.linalg.svd(w2d.astype(jnp.float32), full_matrices=False)
    return U, S, Vh


_batched_svd = jax.jit(jax.vmap(_svd))


def _finish_low_rank(U, S, Vh, rank):
    U = U[:, :rank] * S[:rank][None, :]
    Vh = Vh[:rank, :]
    return U, Vh


def extract_linear(weight, mode="fixed", mode_param=0, svd=None):
    """Returns ((A, B, residual_diff), "low rank") or (weight, "full")."""
    weight = jnp.asarray(weight)
    out_ch, in_ch = weight.shape
    if mode == "full":
        return weight, "full"
    U, S, Vh = svd if svd is not None else _svd(weight)
    rank = _select_rank(np.asarray(S), mode, mode_param)
    rank = min(out_ch, in_ch, max(1, rank))
    if rank >= out_ch / 2:
        return weight, "full"
    U, Vh = _finish_low_rank(U, S, Vh, rank)
    diff = weight - U @ Vh
    return (Vh.reshape(rank, in_ch), U.reshape(out_ch, rank), diff), "low rank"


def extract_conv(weight, mode="fixed", mode_param=0, is_cp=False, svd=None):
    weight = jnp.asarray(weight)
    out_ch, in_ch, *k = weight.shape
    if mode == "full":
        return weight, "full"
    U, S, Vh = svd if svd is not None else _svd(weight.reshape(out_ch, -1))
    rank = _select_rank(np.asarray(S), mode, mode_param)
    rank = min(out_ch, in_ch, max(1, rank))
    if rank >= out_ch / 2 and not is_cp:
        return weight, "full"
    U, Vh = _finish_low_rank(U, S, Vh, rank)
    diff = weight - (U @ Vh).reshape(weight.shape)
    A = Vh.reshape(rank, in_ch, *k)
    B = U.reshape(out_ch, rank, *(1 for _ in k))
    return (A, B, diff), "low rank"


# ---------------------------------------------------------------------------
# Whole-model diff extraction
# ---------------------------------------------------------------------------

UNET_TARGET = ["Linear", "Conv2d", "LayerNorm", "GroupNorm", "GroupNorm32", "Dense", "Conv"]
TE_TARGET = ["Embedding", "Embed", *UNET_TARGET]
LORA_PREFIX_UNET = "lora_unet"
LORA_PREFIX_TEXT_ENCODER = "lora_te"


def _leaf_weights(graph: ModelGraph, targets):
    out = {}
    for name, node in graph.named_modules():
        if node.class_name in targets and node.is_leaf:
            w, b = graph.node_weights(node)
            out[name] = (node, np.asarray(w), None if b is None else np.asarray(b))
    return out


def extract_diff(
    base_tes,
    db_tes,
    base_unet,
    db_unet,
    mode="fixed",
    linear_mode_param=0,
    conv_mode_param=0,
    extract_device=None,
    use_bias=False,
    sparsity=0.98,
    small_conv=True,
) -> dict:
    """Per-layer SVD of (W_db − W_base) over matched model trees.

    Arguments are ModelGraphs (or anything ``ModelGraph.from_torch`` accepts);
    returns a flat fp16 state dict in the reference key grammar
    (utils/__init__.py:157-353).
    """
    from ..wrapper import _as_graph

    base_tes = [_as_graph(t) for t in (base_tes or [])]
    db_tes = [_as_graph(t) for t in (db_tes or [])]
    base_unet = _as_graph(base_unet)
    db_unet = _as_graph(db_unet)

    def make_state_dict(prefix, base_graph, db_graph, targets):
        loras = {}
        base_leaves = _leaf_weights(base_graph, targets)
        db_leaves = _leaf_weights(db_graph, targets)
        shared = [n for n in db_leaves if n in base_leaves]

        # ---- batched SVD: group weight deltas by 2D shape, vmap over group
        svd_results = {}
        if mode != "full":
            groups = defaultdict(list)
            for name in shared:
                node, w_base, _ = base_leaves[name]
                _, w_db, _ = db_leaves[name]
                li = node.adapter.layer_info
                if node.class_name in ("Embed", "Embedding"):
                    continue  # embeddings never low-rank (full mode only)
                if li.module_type == "linear" or li.is_conv:
                    if np.allclose(w_base, w_db):
                        continue
                    # delta = tuned − base (reference: root_weight − weights.weight
                    # with root=db tree, utils/__init__.py:228-233)
                    delta = (w_db - w_base).reshape(w_base.shape[0], -1)
                    groups[delta.shape].append((name, delta))
            for shape, items in groups.items():
                stacked = jnp.asarray(np.stack([d for _, d in items]))
                U, S, Vh = _batched_svd(stacked)
                U, S, Vh = map(np.asarray, (U, S, Vh))
                for i, (name, _) in enumerate(items):
                    svd_results[name] = (jnp.asarray(U[i]), jnp.asarray(S[i]), jnp.asarray(Vh[i]))

        for name in shared:
            node, w_base, b_base = base_leaves[name]
            _, w_db, b_db = db_leaves[name]
            if np.allclose(w_base, w_db):
                continue
            li = node.adapter.layer_info
            lora_name = (prefix + "." + name).replace(".", "_")
            layer_kind = li.module_type

            is_embedding = node.class_name in ("Embed", "Embedding")
            if mode == "full":
                decompose_mode = "full"
            elif is_embedding or li.is_norm or (not li.is_conv and layer_kind != "linear"):
                # norms/embeddings are only stored in full mode
                # (reference utils/__init__.py:236-246 'else: continue')
                continue
            elif layer_kind == "linear":
                weight, decompose_mode = extract_linear(
                    w_db - w_base, mode, linear_mode_param, svd=svd_results.get(name)
                )
                if decompose_mode == "low rank":
                    extract_a, extract_b, diff = weight
            elif li.is_conv:
                is_linear = all(kk == 1 for kk in li.shape[2:])
                weight, decompose_mode = extract_conv(
                    w_db - w_base,
                    mode,
                    linear_mode_param if is_linear else conv_mode_param,
                    svd=svd_results.get(name),
                )
                if decompose_mode == "low rank":
                    extract_a, extract_b, diff = weight
                    if small_conv and not is_linear:
                        dim = extract_a.shape[0]
                        (extract_c, extract_a, _), _ = extract_conv(
                            jnp.swapaxes(extract_a, 0, 1), "fixed", dim, is_cp=True
                        )
                        extract_a = jnp.swapaxes(extract_a, 0, 1)
                        extract_c = jnp.swapaxes(extract_c, 0, 1)
                        loras[f"{lora_name}.lora_mid.weight"] = np.asarray(extract_c, np.float16)
                        # residual of the DELTA (the reference subtracts the
                        # rebuild from root_weight — a bug; the COO bias must
                        # complete delta, not the absolute weight)
                        diff = jnp.asarray(w_db - w_base) - jnp.einsum(
                            "ijkl,jr,pi->prkl",
                            extract_c,
                            extract_a.reshape(extract_a.shape[0], -1),
                            extract_b.reshape(extract_b.shape[0], -1),
                            precision=jax.lax.Precision.HIGHEST,
                        )
            else:
                continue

            if decompose_mode == "low rank":
                loras[f"{lora_name}.lora_down.weight"] = np.asarray(extract_a, np.float16)
                loras[f"{lora_name}.lora_up.weight"] = np.asarray(extract_b, np.float16)
                loras[f"{lora_name}.alpha"] = np.asarray([extract_a.shape[0]], np.float16)
                if use_bias:
                    d = np.asarray(diff).reshape(extract_b.shape[0], -1)
                    sparse = make_sparse(d, sparsity)
                    idx = np.nonzero(sparse)
                    loras[f"{lora_name}.bias_indices"] = np.stack(idx).astype(np.int16)
                    loras[f"{lora_name}.bias_values"] = sparse[idx].astype(np.float16)
                    loras[f"{lora_name}.bias_size"] = np.asarray(d.shape, np.int16)
            elif decompose_mode == "full":
                w_key, b_key = ("w_norm", "b_norm") if li.is_norm else ("diff", "diff_b")
                loras[f"{lora_name}.{w_key}"] = np.asarray(w_db - w_base, np.float16)
                if b_base is not None and b_db is not None:
                    loras[f"{lora_name}.{b_key}"] = np.asarray(b_db - b_base, np.float16)
            else:
                raise NotImplementedError
        return loras

    all_loras = {}
    all_loras |= make_state_dict(LORA_PREFIX_UNET, base_unet, db_unet, UNET_TARGET)
    for idx, (te1, te2) in enumerate(zip(base_tes, db_tes)):
        prefix = (
            f"{LORA_PREFIX_TEXT_ENCODER}{idx + 1}" if len(base_tes) > 1 else LORA_PREFIX_TEXT_ENCODER
        )
        all_loras |= make_state_dict(prefix, te1, te2, TE_TARGET)

    names = {k.rsplit(".", 1)[0] for k in all_loras}
    logger.info(f"{len(names)} modules extracted")
    return all_loras
