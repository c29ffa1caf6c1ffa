"""Torch-checkpoint <-> flax-params converters (both directions).

``convert_state_dict`` maps the reference's state_dict key schema
(reference experiments/model.py:399 shows the keys; snapshot layout in
engine/base_trainer.py:113-138) onto this framework's flax parameter tree,
for running the published KITTI weights without retraining. Validated
end-to-end: tests/test_golden_e2e.py converts a live reference model's
state_dict and matches every pipeline stage to ~1e-6 relative on the
bundled demo pair (the published blob itself is missing from the reference
mount, .MISSING_LARGE_BLOBS).

``export_state_dict`` is the exact inverse: a flax parameter tree (e.g. a
TPU-trained checkpoint) filled into the reference's key schema, so a model
trained here can be taken BACK to the torch reference and evaluated with
its original tooling. Round-trip tested key-for-key against a live
reference model (tests/test_torch_parity.py).

Conventions handled:
* torch Linear weight (out, in) <-> flax Dense kernel (in, out);
* torch LayerNorm/GroupNorm weight/bias <-> flax scale/bias;
* KPConv weights (K, Cin, Cout) map 1:1; the kernel_points buffer is
  restored VERBATIM (the reference randomizes each layer's kernel
  disposition unseeded at build time — trained weights are only meaningful
  with the checkpoint's own kernels, see nn/kpconv.py);
* reference RPEConditionalTransformer ``layers.{2l}``/``layers.{2l+1}``
  (alternating rotary-self / vanilla-cross) -> our ``self_{l}`` /
  ``cross_{l}`` modules;
* the reference nests attention's output linear+norm one level deeper
  (RPEAttentionLayer) than we do — flattened here;
* the sinusoidal ``div_term`` buffer is dropped on import (regenerated)
  and synthesized from its shape on export
  (positional_embedding.py:13-16).
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, Mapping, Sequence, Tuple, Union

import numpy as np


def _assign(tree: Dict, path, value):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def _lookup(tree: Dict, path):
    node = tree
    for key in path:
        if not isinstance(node, dict) or key not in node:
            raise KeyError(
                f"flax params missing {'/'.join(path)} (stopped at {key!r})"
            )
        node = node[key]
    return node


def _map_transformer_key(parts, prefix):
    """['layers', '3', ...] within a conditional transformer -> our path."""
    idx = int(parts[1])
    layer_name = f"self_{idx // 2}" if idx % 2 == 0 else f"cross_{idx // 2}"
    rest = parts[2:]
    # reference: attention.attention.proj_q / attention.linear /
    # attention.norm / output.expand ...
    if rest[0] == "attention" and rest[1] == "attention":
        tail = rest[2:]
        return prefix + [layer_name, "attention"] + tail
    if rest[0] == "attention":
        # linear / norm of the attention sub-layer -> flattened into the layer
        return prefix + [layer_name] + rest[1:]
    return prefix + [layer_name] + rest


def _flax_path_and_kind(key: str, ndim: int) -> Tuple[Tuple[str, ...], str]:
    """Torch state_dict key -> (flax tree path, value kind).

    Kinds: 'linear_kernel' (transpose), 'verbatim' (copy as-is),
    'div_term' (buffer regenerated on import / synthesized on export).
    Single source of truth for both conversion directions.
    """
    parts = key.split(".")

    # transformer stacks: <name>.transformer.layers.N....
    if ".transformer.layers." in key or re.match(r"transformer2?\.layers\.", key):
        head, _, tail = key.partition(".layers.")
        parts = ["layers"] + tail.split(".")
        path = _map_transformer_key(parts, head.split("."))
    else:
        path = parts

    kind = "verbatim"
    leaf = path[-1]
    if leaf == "weight":
        if ndim == 2:  # Linear
            kind = "linear_kernel"
            path = path[:-1] + ["kernel"]
        else:  # norm scale
            path = path[:-1] + ["scale"]
    elif leaf == "div_term":
        kind = "div_term"

    # Collapse the reference's extra module nesting onto our flat names:
    # * GroupNorm wrapper: `<block>.norm.norm.*` / `norm_conv.norm.*`
    #   -> our MaskedGroupNorm sits directly at `<block>.norm[_conv]`
    # * ThDRoFormer inner stack: `transformer.transformer.<layer>` ->
    #   our layers live directly under the ThDRoFormer module
    # * geometric embedding: `embedding.proj` -> our single Dense
    collapsed = []
    for p in path:
        if collapsed and (
            (p == "norm" and collapsed[-1] in ("norm", "norm_conv"))
            or (p == "transformer" and collapsed[-1] in ("transformer", "transformer2"))
            or (p == "proj" and collapsed[-1] == "embedding")
        ):
            continue
        collapsed.append(p)
    path = collapsed
    # vote layer sequential indices: mlp_modules.{0,3}=Dense,
    # {1,4}=LayerNorm -> mlp_{i}/mlp_norm_{i}
    if path[0] == "vote" and len(path) > 1 and path[1] == "mlp_modules":
        seq = int(path[2])
        sub = "mlp" if seq % 3 == 0 else "mlp_norm"
        path = ["vote", f"{sub}_{seq // 3}"] + path[3:]
    if path[0] == "vote" and len(path) > 1 and path[1] == "out_proj":
        path = ["vote", "out_norm"] + path[3:]

    return tuple(path), kind


def convert_state_dict(state_dict: Dict[str, np.ndarray]) -> Dict:
    """Reference state_dict (numpy arrays, 'module.' prefix stripped) ->
    nested flax params dict (contents of params['params'])."""
    out: Dict = {}
    for key, value in state_dict.items():
        v = np.asarray(value)
        path, kind = _flax_path_and_kind(key, v.ndim)
        if kind == "div_term":
            continue  # regenerated buffer
        if kind == "linear_kernel":
            v = v.T
        _assign(out, path, v)
    return out


def export_state_dict(
    params: Dict,
    reference_shapes: Union[Mapping[str, Sequence[int]], Iterable[str]],
) -> Dict[str, np.ndarray]:
    """Flax params (contents of params['params']) -> reference state_dict.

    ``reference_shapes`` is the target key schema: a {key: shape} mapping
    (e.g. ``{k: tuple(v.shape) for k, v in torch_model.state_dict().items()}``)
    or a plain key iterable when no 2-D-vs-1-D 'weight' disambiguation or
    buffer synthesis is needed. Every requested key is produced; a key whose
    flax counterpart is absent raises KeyError (schema mismatch — e.g.
    exporting a ``coarse_module`` variant against the stock reference).
    """
    if not isinstance(reference_shapes, Mapping):
        reference_shapes = {k: None for k in reference_shapes}
    out: Dict[str, np.ndarray] = {}
    for key, shape in reference_shapes.items():
        if shape is None:
            # infer ndim by probing: Linear vs norm 'weight' both exist; try
            # the 2-D interpretation first, fall back to scale
            try:
                path, kind = _flax_path_and_kind(key, 2)
                v = np.asarray(_lookup(params, path))
            except KeyError:
                path, kind = _flax_path_and_kind(key, 1)
                v = None
        else:
            path, kind = _flax_path_and_kind(key, len(shape))
            v = None
        if kind == "div_term":
            if shape is None:
                raise ValueError(
                    f"{key}: div_term synthesis needs the target shape — "
                    "pass a {key: shape} mapping"
                )
            shape = tuple(int(s) for s in shape)
            if len(shape) == 1:
                # sinusoidal (positional_embedding.py:13-16):
                # exp(arange(0, d, 2) * (-ln 1e4 / d)), d = 2 * len
                d_model = 2 * shape[0]
                out[key] = np.exp(
                    np.arange(0, d_model, 2, dtype=np.float32)
                    * np.float32(-np.log(10000.0) / d_model)
                )
            else:
                # rotary (thdroformer.py:48-52): per-head d, then
                # nearest-interpolated x2 (pairwise repeat) to (1,1,1,d)
                d = shape[-1]
                base = np.exp(
                    np.arange(0, d, 2, dtype=np.float32)
                    * np.float32(-np.log(10000.0) / d)
                )
                out[key] = np.repeat(base, 2).reshape(shape)
            continue
        if v is None:
            v = np.asarray(_lookup(params, path))
        if kind == "linear_kernel":
            v = v.T
        if shape is not None and tuple(v.shape) != tuple(shape):
            raise ValueError(
                f"{key}: shape mismatch, flax {v.shape} vs reference {tuple(shape)}"
            )
        out[key] = v
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth.tar snapshot into numpy (strips 'module.')."""
    import torch

    blob = torch.load(path, map_location="cpu")
    state = blob.get("model", blob.get("state_dict", blob))
    return {
        k[len("module."):] if k.startswith("module.") else k: v.numpy()
        for k, v in state.items()
    }
