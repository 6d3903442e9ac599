"""Model graph abstraction — the TPU-native replacement for torch's
``named_modules()`` walk (reference wrapper.py:408-468).

The reference targeting engine iterates a live ``nn.Module`` tree and
monkey-patches forwards. JAX models are pure functions over param pytrees, so
here a :class:`ModelGraph` is an *ordered* list of named nodes (containers and
leaf layers), built from:

- a flax.linen model via one traced forward pass (``ModelGraph.from_linen``)
  — the linen interceptor records every submodule call with its class name,
  dotted path and layer hyperparams;
- a torch ``nn.Module`` (``ModelGraph.from_torch``) — used by the merge /
  extract toolchain and for parity tests against the reference;
- manual construction (``add``).

Each leaf node carries a :class:`LayerAdapter` that presents the layer in
canonical *torch layout* (weights ``(out, in, *k)``, channels-first
activations) no matter what the host framework uses, so adapter modules and
safetensors checkpoints stay bit-compatible with PyTorch LyCORIS files.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .modules.base import LayerInfo


# ---------------------------------------------------------------------------
# Layer adapters: native layout <-> torch layout
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class LayerAdapter:
    """Bridges one native layer to torch-layout adapter math.

    ``get_weights(variables)``: native params subtree -> (w_torch, bias).
    ``put_weights(variables, w, b)``: inverse (for merge_to).
    ``to_cf``/``from_cf``: INPUT activation layout conversion (None =
    identity); ``out_to_cf``/``out_from_cf``: OUTPUT conversion, defaulting
    to the input pair — they differ only for layers whose input and output
    layouts diverge (head-split attention projections: 3D in, 4D out).
    ``native_op(x_torch, w_torch, bias)``: optional fast path producing the
    NATIVE-layout output directly (used by the merged forward so e.g. the
    head split stays fused into the projection matmul).
    """

    layer_info: LayerInfo
    get_weights: Callable
    put_weights: Callable | None = None
    to_cf: Callable | None = None
    from_cf: Callable | None = None
    out_to_cf: Callable | None = None
    out_from_cf: Callable | None = None
    native_op: Callable | None = None

    def cf_in(self, x):
        """Native layer input -> torch-layout input."""
        return x if self.to_cf is None else self.to_cf(x)

    def cf_in_inv(self, z):
        """Torch-layout input -> native layer input."""
        return z if self.from_cf is None else self.from_cf(z)

    def cf_out(self, y):
        """Torch-layout output -> native layer output."""
        f = self.out_from_cf if self.out_from_cf is not None else self.from_cf
        return y if f is None else f(y)

    def cf_out_inv(self, y):
        """Native layer output -> torch-layout output."""
        f = self.out_to_cf if self.out_to_cf is not None else self.to_cf
        return y if f is None else f(y)


def _t(x):
    return jnp.asarray(x)


def _flax_dense_adapter(mod, params) -> LayerAdapter:
    kernel = params["kernel"]
    has_bias = "bias" in params
    li = LayerInfo.linear(kernel.shape[1], kernel.shape[0], has_bias)
    return LayerAdapter(
        layer_info=li,
        get_weights=lambda p: (_t(p["kernel"]).T, _t(p["bias"]) if "bias" in p else None),
        put_weights=lambda p, w, b: {
            **p,
            "kernel": w.T,
            **({"bias": b} if b is not None and "bias" in p else {}),
        },
    )


def _flax_conv_adapter(mod, params) -> LayerAdapter:
    kernel = params["kernel"]  # (*k, in/g, out)
    nd = kernel.ndim - 2
    has_bias = "bias" in params
    strides = getattr(mod, "strides", None) or 1
    padding = getattr(mod, "padding", "SAME")
    dilation = getattr(mod, "kernel_dilation", None) or 1
    groups = getattr(mod, "feature_group_count", 1)
    if isinstance(padding, str):
        pad = padding
    else:
        pad = padding
    li = LayerInfo.conv(
        nd,
        kernel.shape[-1],
        kernel.shape[-2] * groups,
        kernel.shape[:nd],
        stride=strides,
        padding=pad,
        dilation=dilation,
        groups=groups,
        bias=has_bias,
    )
    perm = (nd + 1, nd, *range(nd))  # (*k, I, O) -> (O, I, *k)
    inv_perm = tuple(np.argsort(perm))

    def get_weights(p):
        return (
            jnp.transpose(_t(p["kernel"]), perm),
            _t(p["bias"]) if "bias" in p else None,
        )

    def put_weights(p, w, b):
        out = {**p, "kernel": jnp.transpose(w, inv_perm)}
        if b is not None and "bias" in p:
            out["bias"] = b
        return out

    # NHWC <-> NCHW
    def to_cf(x):
        return jnp.moveaxis(x, -1, 1)

    def from_cf(y):
        return jnp.moveaxis(y, 1, -1)

    return LayerAdapter(li, get_weights, put_weights, to_cf, from_cf)


def _flax_layernorm_adapter(mod, params) -> LayerAdapter:
    scale = params.get("scale")
    dim = scale.shape[0] if scale is not None else None
    has_bias = "bias" in params
    li = LayerInfo.layer_norm(dim, getattr(mod, "epsilon", 1e-5), has_bias)
    return LayerAdapter(
        layer_info=li,
        get_weights=lambda p: (_t(p["scale"]), _t(p["bias"]) if "bias" in p else None),
        put_weights=lambda p, w, b: {
            **p,
            "scale": w,
            **({"bias": b} if b is not None and "bias" in p else {}),
        },
    )


def _flax_rmsnorm_adapter(mod, params) -> LayerAdapter:
    scale = params.get("scale")
    has_bias = "bias" in params
    li = LayerInfo.rms_norm(scale.shape[0], getattr(mod, "epsilon", 1e-6), has_bias)
    return LayerAdapter(
        layer_info=li,
        get_weights=lambda p: (_t(p["scale"]), _t(p["bias"]) if "bias" in p else None),
        put_weights=lambda p, w, b: {
            **p,
            "scale": w,
            **({"bias": b} if b is not None and "bias" in p else {}),
        },
    )


def _flax_groupnorm_adapter(mod, params) -> LayerAdapter:
    scale = params.get("scale")
    dim = scale.shape[0]
    has_bias = "bias" in params
    li = LayerInfo.group_norm(getattr(mod, "num_groups", 32), dim, getattr(mod, "epsilon", 1e-5), has_bias)
    return LayerAdapter(
        layer_info=li,
        get_weights=lambda p: (_t(p["scale"]), _t(p["bias"]) if "bias" in p else None),
        put_weights=lambda p, w, b: {
            **p,
            "scale": w,
            **({"bias": b} if b is not None and "bias" in p else {}),
        },
        to_cf=lambda x: jnp.moveaxis(x, -1, 1),
        from_cf=lambda y: jnp.moveaxis(y, 1, -1),
    )


def _torch_layout_adapter(li: LayerInfo) -> LayerAdapter:
    """For layers already in torch layout (our models/layers.py primitives)."""
    return LayerAdapter(
        layer_info=li,
        get_weights=lambda p: (_t(p["weight"]), _t(p["bias"]) if "bias" in p else None),
        put_weights=lambda p, w, b: {
            **p,
            "weight": w,
            **({"bias": b} if b is not None and "bias" in p else {}),
        },
    )


def _quant_adapter(li: LayerInfo) -> LayerAdapter:
    """int8 weight-only layers (lycoris_tpu.utils.quant): weights are exposed
    dequantized; merge-back is unsupported (bypass mode is forced anyway)."""
    from .utils.quant import dequantize_int8

    def get_weights(p):
        w = dequantize_int8(p["weight_q"], p["scale"], jnp.float32)
        return w, _t(p["bias"]) if "bias" in p else None

    return LayerAdapter(layer_info=li, get_weights=get_weights, put_weights=None)


def adapter_for_linen(mod, params) -> LayerAdapter | None:
    """Map a bound linen module instance to a LayerAdapter (None = container)."""
    cls = type(mod).__name__
    # our torch-layout primitives advertise themselves
    li_fn = getattr(mod, "lycoris_layer_info", None)
    if li_fn is not None:
        li = li_fn(params) if callable(li_fn) else li_fn
        if isinstance(params, dict) and "weight_q" in params:
            return _quant_adapter(li)
        ad = _torch_layout_adapter(li)
        hs = getattr(mod, "head_split", None)
        if hs is not None and li.module_type == "linear":
            from .functional.general import linear_head_split

            heads, head_dim = hs
            # input is already torch layout (…, T, C); only the OUTPUT
            # diverges: native (…, H, T, D) <-> torch (…, T, H*D)
            ad.out_from_cf = lambda y: jnp.moveaxis(
                y.reshape(*y.shape[:-1], heads, head_dim), -2, -3
            )
            ad.out_to_cf = lambda y: jnp.moveaxis(y, -3, -2).reshape(
                *y.shape[:-3], y.shape[-2], heads * head_dim
            )
            ad.native_op = lambda x, w, b: linear_head_split(x, w, b, heads, head_dim)
        return ad
    if params is None or not isinstance(params, dict):
        return None
    try:
        if cls in ("Embed", "Embedding") and "embedding" in params:
            # embeddings are extract-only (full diff mode); weight exposed as
            # a (vocab, dim) matrix, never adapted at runtime
            emb = params["embedding"]
            li = LayerInfo.linear(emb.shape[0], emb.shape[1], False)
            return LayerAdapter(
                layer_info=li,
                get_weights=lambda p: (_t(p["embedding"]), None),
                put_weights=lambda p, w, b: {**p, "embedding": w},
            )
        if cls in ("Dense", "DenseGeneral") and "kernel" in params and np.ndim(params["kernel"]) == 2:
            return _flax_dense_adapter(mod, params)
        if cls in ("Conv", "ConvLocal") and "kernel" in params:
            return _flax_conv_adapter(mod, params)
        if cls == "LayerNorm" and "scale" in params:
            return _flax_layernorm_adapter(mod, params)
        if cls == "RMSNorm" and "scale" in params:
            # reference duck-types these via the `_norm` attribute
            # (norms.py:37-44); the delta op must NOT subtract a mean
            return _flax_rmsnorm_adapter(mod, params)
        if cls == "GroupNorm" and "scale" in params:
            return _flax_groupnorm_adapter(mod, params)
    except Exception:
        return None
    return None


# ---------------------------------------------------------------------------
# The graph
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Node:
    name: str  # dotted path ("" = root)
    class_name: str
    adapter: LayerAdapter | None = None  # None for containers
    params_path: tuple = ()  # path into the params pytree
    extra: dict = dataclasses.field(default_factory=dict)

    @property
    def is_leaf(self) -> bool:
        return self.adapter is not None


class ModelGraph:
    """Ordered node list + params accessor, named_modules()-compatible order."""

    def __init__(self, nodes=None, params=None, framework: str = "generic"):
        self.nodes: list[Node] = list(nodes or [])
        self._by_name = {n.name: n for n in self.nodes}
        self.params = params  # native params pytree (flax) or None (torch)
        self.framework = framework

    def add(self, node: Node):
        self.nodes.append(node)
        self._by_name[node.name] = node

    def __getitem__(self, name: str) -> Node:
        return self._by_name[name]

    def get(self, name: str):
        return self._by_name.get(name)

    def named_modules(self, root: str = ""):
        """Yield (relative_name, node) for nodes under ``root``, root first —
        mirrors torch named_modules() iteration (wrapper.py:417)."""
        prefix = root + "." if root else ""
        for n in self.nodes:
            if root == "" or n.name == root or n.name.startswith(prefix):
                rel = n.name[len(prefix):] if root and n.name != root else ("" if n.name == root else n.name)
                yield rel, n

    def get_params(self, node: Node):
        """Native params subtree for a leaf node."""
        sub = self.params
        for k in node.params_path:
            sub = sub[k]
        return sub

    def node_weights(self, node: Node):
        return node.adapter.get_weights(self.get_params(node))

    # -- constructors -------------------------------------------------------
    @staticmethod
    def from_linen(model, variables, *args, method=None, **kwargs) -> "ModelGraph":
        """Trace one forward pass, recording every submodule call."""
        import flax.linen as nn

        params = variables.get("params", variables)
        records: dict[tuple, Node] = {}
        order: list[tuple] = []

        def interceptor(next_fun, fargs, fkwargs, context):
            if context.method_name != "__call__":
                return next_fun(*fargs, **fkwargs)
            mod = context.module
            path = mod.path
            if path not in records:
                sub = params
                ok = True
                for k in path:
                    if isinstance(sub, dict) and k in sub:
                        sub = sub[k]
                    else:
                        ok = False
                        break
                leaf_params = sub if ok else None
                adapter = adapter_for_linen(mod, leaf_params)
                name = ".".join(str(p) for p in path)
                if adapter is not None:
                    adapter.layer_info = dataclasses.replace(adapter.layer_info, name=name)
                records[path] = Node(
                    name=name,
                    class_name=type(mod).__name__,
                    adapter=adapter,
                    params_path=tuple(path),
                )
                order.append(path)
            return next_fun(*fargs, **fkwargs)

        # abstract trace: records structure without executing a single op on
        # device (an eager apply would dispatch thousands of tiny kernels)
        def _run(v, a):
            with nn.intercept_methods(interceptor):
                if method is not None:
                    return model.apply(v, *a, method=method, **kwargs)
                return model.apply(v, *a, **kwargs)

        jax.eval_shape(_run, variables, args)

        nodes = [records[p] for p in order]
        g = ModelGraph(nodes, params=params, framework="linen")
        g.model = model
        return g

    @staticmethod
    def from_state_dict(sd: dict, framework: str = "torch_sd") -> "ModelGraph":
        """Build a graph directly from a flat torch-style state dict
        (``{name}.weight`` / ``{name}.bias`` keys). Layer kinds are inferred
        from weight ndim (2=Linear, 3/4/5=ConvNd, 1=LayerNorm); conv
        hyperparams beyond kernel size are unknown, which is fine for the
        merge/extract tools (they only touch weights, never run the op)."""
        nodes = [Node(name="", class_name="root", adapter=None, params_path=())]
        params = {}
        for key in sd:
            if not key.endswith(".weight"):
                continue
            name = key[: -len(".weight")]
            w = np.asarray(sd[key])
            b = sd.get(f"{name}.bias")
            b = None if b is None else np.asarray(b)
            if w.ndim == 2:
                li = LayerInfo.linear(w.shape[0], w.shape[1], b is not None, name)
                cls = "Linear"
            elif w.ndim in (3, 4, 5):
                nd = w.ndim - 2
                li = LayerInfo.conv(nd, w.shape[0], w.shape[1], w.shape[2:], bias=b is not None, name=name)
                cls = f"Conv{nd}d"
            elif w.ndim == 1:
                li = LayerInfo.layer_norm(w.shape[0], bias=b is not None, name=name)
                cls = "LayerNorm"
            else:
                continue
            params[name] = {"weight": w, **({"bias": b} if b is not None else {})}
            nodes.append(
                Node(name=name, class_name=cls, adapter=_torch_layout_adapter(li), params_path=(name,))
            )
        return ModelGraph(nodes, params=params, framework=framework)

    @staticmethod
    def from_torch(module) -> "ModelGraph":
        """Build from a torch nn.Module (merge/extract tooling + parity tests)."""
        import torch.nn as tnn

        nodes = []
        for name, mod in module.named_modules():
            adapter = None
            params_np = {}
            li = None
            if isinstance(mod, tnn.Linear):
                li = LayerInfo.linear(mod.out_features, mod.in_features, mod.bias is not None, name)
            elif isinstance(mod, (tnn.Conv1d, tnn.Conv2d, tnn.Conv3d)):
                nd = mod.weight.ndim - 2
                li = LayerInfo.conv(
                    nd,
                    mod.out_channels,
                    mod.in_channels,
                    mod.kernel_size,
                    stride=mod.stride,
                    padding=mod.padding if not isinstance(mod.padding, str) else mod.padding,
                    dilation=mod.dilation,
                    groups=mod.groups,
                    bias=mod.bias is not None,
                    name=name,
                )
            elif isinstance(mod, tnn.LayerNorm):
                li = LayerInfo.layer_norm(tuple(mod.normalized_shape), mod.eps, mod.bias is not None, name)
            elif isinstance(mod, tnn.GroupNorm):
                li = LayerInfo.group_norm(mod.num_groups, mod.num_channels, mod.eps, mod.bias is not None, name)
            elif isinstance(mod, tnn.Embedding):
                li = LayerInfo.linear(mod.num_embeddings, mod.embedding_dim, False, name)
            elif hasattr(tnn, "RMSNorm") and isinstance(mod, tnn.RMSNorm):
                li = LayerInfo.rms_norm(
                    tuple(mod.normalized_shape), mod.eps if mod.eps is not None else 1e-6,
                    getattr(mod, "bias", None) is not None, name,
                )
            elif (
                getattr(mod, "weight", None) is not None
                and hasattr(mod, "_norm")
                and callable(mod._norm)
                and getattr(mod.weight, "ndim", 0) >= 1
            ):
                # reference duck-typing (norms.py:37-44): any module exposing
                # `weight` + a stats-only `_norm` counts as an RMSNorm-like
                li = LayerInfo.rms_norm(
                    tuple(mod.weight.shape),
                    float(getattr(mod, "eps", getattr(mod, "variance_epsilon", 1e-6))),
                    getattr(mod, "bias", None) is not None, name,
                )
            if li is not None:
                w = mod.weight.detach().cpu().numpy()
                b = mod.bias.detach().cpu().numpy() if getattr(mod, "bias", None) is not None else None
                params_np = {"weight": w}
                if b is not None:
                    params_np["bias"] = b
                adapter = _torch_layout_adapter(li)
            node = Node(
                name=name,
                class_name=type(mod).__name__,
                adapter=adapter,
                params_path=(name,),
                extra={"torch_module": mod},
            )
            nodes.append(node)
        params = {
            n.name: {
                "weight": n.extra["torch_module"].weight.detach().cpu().numpy(),
                **(
                    {"bias": n.extra["torch_module"].bias.detach().cpu().numpy()}
                    if getattr(n.extra["torch_module"], "bias", None) is not None
                    else {}
                ),
            }
            for n in nodes
            if n.is_leaf
        }
        return ModelGraph(nodes, params=params, framework="torch")
