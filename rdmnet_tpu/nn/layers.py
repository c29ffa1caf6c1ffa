"""Generic layer factory + Conv-Norm-Act block (flax, channel-last).

TPU-native counterpart of the reference's config-driven layer builders
(geotransformer/modules/layers/factory.py:1-90 and conv_block.py:10-107).
The reference keeps these around as a general toolkit for ablation
architectures even though the main RDMNet path builds its layers directly;
this module provides the same string/dict-config surface in flax idiom so
downstream variants can be assembled from configs here too.

Deliberate redesigns for TPU/JAX:

* everything is channel-LAST ((..., C), NWC/NHWC/NDHWC) — the layout XLA
  tiles onto the MXU — where the reference is torch channel-first;
* activations are functions, not modules (they carry no state);
* dropout/batch-norm expose flax's explicit ``deterministic``/``use_running_
  average`` switches instead of torch's implicit ``module.training`` flag.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

LayerCfg = Union[str, Mapping[str, Any]]


def parse_cfg(cfg: LayerCfg) -> Tuple[str, Dict[str, Any]]:
    """Normalize a ``'LayerName'`` or ``{'type': 'LayerName', ...}`` config
    (reference factory.py:38-45). Accepts any mapping — flax freezes dict
    module attributes into FrozenDicts."""
    if isinstance(cfg, str):
        return cfg, {}
    if not isinstance(cfg, Mapping):
        raise TypeError(f"illegal layer cfg type: {type(cfg)}")
    kwargs = dict(cfg)
    return kwargs.pop("type"), kwargs


# name -> activation fn builder (reference factory.py ACT_LAYERS)
_ACTIVATIONS: Dict[str, Callable[..., Callable[[jnp.ndarray], jnp.ndarray]]] = {
    "ReLU": lambda: jax.nn.relu,
    # torch's default slope is 0.01 but the reference factory injects 0.2
    # (factory.py:79-81), matching its KPConv blocks
    "LeakyReLU": lambda negative_slope=0.2: (
        lambda x: jax.nn.leaky_relu(x, negative_slope=negative_slope)
    ),
    "ELU": lambda: jax.nn.elu,
    "GELU": lambda: jax.nn.gelu,
    "Sigmoid": lambda: jax.nn.sigmoid,
    "Softplus": lambda: jax.nn.softplus,
    "Tanh": lambda: jnp.tanh,
    "Identity": lambda: (lambda x: x),
}


def build_act_layer(act_cfg: Optional[LayerCfg]) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Activation factory (reference factory.py:72-82); None -> identity."""
    if act_cfg is None:
        return lambda x: x
    name, kwargs = parse_cfg(act_cfg)
    if name not in _ACTIVATIONS:
        raise ValueError(f"illegal activation: {name}")
    return _ACTIVATIONS[name](**kwargs)


def build_dropout_layer(p: Optional[float], **kwargs):
    """Dropout factory (reference factory.py:48-53); p in (None, 0) -> no-op.

    The returned callable takes ``(x, deterministic=...)``; flax's explicit
    RNG threading replaces torch's global training flag.
    """
    if p is None or p == 0:
        return lambda x, deterministic=True: x
    return nn.Dropout(rate=p, **kwargs)


def build_norm_layer(num_features: int, norm_cfg: Optional[LayerCfg]) -> Optional[nn.Module]:
    """Normalization factory (reference factory.py:56-69); None -> None.

    Supported: GroupNorm, LayerNorm, BatchNorm{1,2,3}d, InstanceNorm{1,2,3}d.
    Batch/instance norms return flax modules whose call takes
    ``use_running_average`` / operates per-sample respectively; the channel
    axis is always last.
    """
    if norm_cfg is None:
        return None
    name, kwargs = parse_cfg(norm_cfg)
    # torch norms use eps=1e-5 where flax defaults to 1e-6 — pin the torch
    # value so converted weights stay numerically aligned
    kwargs.setdefault("epsilon", 1e-5)
    if name == "GroupNorm":
        return nn.GroupNorm(num_groups=kwargs.pop("num_groups", 32), **kwargs)
    if name == "LayerNorm":
        return nn.LayerNorm(**kwargs)
    if name.startswith("BatchNorm"):
        # torch momentum=0.1 means new_stat = 0.9*old + 0.1*batch; flax's
        # `momentum` IS that decay factor (0.99 default) — map torch's default
        kwargs.setdefault("momentum", 0.9)
        return nn.BatchNorm(**kwargs)
    if name.startswith("InstanceNorm"):
        # instance norm == group norm with one group per channel, stats over
        # the spatial axes of each sample; torch InstanceNorm defaults to
        # affine=False, so no learnable scale/bias unless the cfg asks
        kwargs.setdefault("use_scale", False)
        kwargs.setdefault("use_bias", False)
        return nn.GroupNorm(num_groups=num_features, **kwargs)
    raise ValueError(f"illegal normalization: {name}")


def _apply_norm(norm: Optional[nn.Module], x: jnp.ndarray, train: bool) -> jnp.ndarray:
    if norm is None:
        return x
    if isinstance(norm, nn.BatchNorm):
        return norm(x, use_running_average=not train)
    return norm(x)


class ConvBlock(nn.Module):
    """Conv/Linear -> Norm -> Act block (reference conv_block.py:10-107).

    ``conv_cfg`` is ``'Linear'`` or ``'Conv{1,2,3}d'``; inputs are
    channel-last. Mirrors the reference's bias rule — the conv bias is
    dropped when a batch/instance norm immediately follows it
    (conv_block.py:45-50) — and its ``act_before_norm`` ordering toggle.
    """

    in_channels: int
    out_channels: int
    conv_cfg: LayerCfg = "Linear"
    kernel_size: Optional[int] = None
    stride: int = 1
    padding: Union[str, int] = 0
    dilation: int = 1
    groups: int = 1
    norm_cfg: Optional[LayerCfg] = None
    act_cfg: Optional[LayerCfg] = None
    act_before_norm: bool = False
    dropout: Optional[float] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv_name, conv_kwargs = parse_cfg(self.conv_cfg)
        norm_name = parse_cfg(self.norm_cfg)[0] if self.norm_cfg is not None else ""
        norm_is_stats = norm_name.startswith(("BatchNorm", "InstanceNorm"))
        use_bias = self.act_before_norm or not norm_is_stats

        if conv_name == "Linear":
            x = nn.Dense(self.out_channels, use_bias=use_bias, **conv_kwargs)(x)
        elif conv_name in ("Conv1d", "Conv2d", "Conv3d"):
            ndim = int(conv_name[4])
            if self.kernel_size is None:
                raise ValueError(f"{conv_name} requires kernel_size")
            pad = self.padding
            if isinstance(pad, int):
                pad = [(pad, pad)] * ndim
            x = nn.Conv(
                self.out_channels,
                kernel_size=(self.kernel_size,) * ndim,
                strides=(self.stride,) * ndim,
                padding=pad,
                kernel_dilation=(self.dilation,) * ndim,
                feature_group_count=self.groups,
                use_bias=use_bias,
                **conv_kwargs,
            )(x)
        else:
            raise ValueError(f"illegal conv layer: {conv_name}")

        norm = build_norm_layer(self.out_channels, self.norm_cfg)
        act = build_act_layer(self.act_cfg)
        if self.act_before_norm:
            x = _apply_norm(norm, act(x), train)
        else:
            x = act(_apply_norm(norm, x, train))
        x = build_dropout_layer(self.dropout)(x, deterministic=not train)
        return x
