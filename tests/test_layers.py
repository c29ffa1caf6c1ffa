"""Generic layer factory / ConvBlock (nn/layers.py) vs the reference's
config-driven builders (geotransformer/modules/layers/{factory,conv_block}.py),
including a live-torch parity check of the Linear+GroupNorm+LeakyReLU block.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdmnet_tpu.nn import layers


def test_parse_cfg_forms():
    assert layers.parse_cfg("ReLU") == ("ReLU", {})
    name, kw = layers.parse_cfg({"type": "LeakyReLU", "negative_slope": 0.1})
    assert name == "LeakyReLU" and kw == {"negative_slope": 0.1}
    with pytest.raises(TypeError):
        layers.parse_cfg(3)


def test_act_factory_matches_jax_fns():
    x = jnp.linspace(-2, 2, 9)
    assert layers.build_act_layer(None)(x) is x
    np.testing.assert_allclose(layers.build_act_layer("ReLU")(x), jax.nn.relu(x))
    # reference default slope is 0.2 (factory.py:79-81), not torch's 0.01
    np.testing.assert_allclose(
        layers.build_act_layer("LeakyReLU")(x), jax.nn.leaky_relu(x, 0.2)
    )
    with pytest.raises(ValueError):
        layers.build_act_layer("Swishish")


def test_dropout_factory_noop_and_active():
    x = jnp.ones((4, 8))
    assert np.all(np.asarray(layers.build_dropout_layer(None)(x)) == 1.0)
    drop = layers.build_dropout_layer(0.5)
    y = drop.apply({}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(0)})
    kept = np.asarray(y) != 0
    assert 0 < kept.sum() < kept.size  # some dropped, some scaled-kept
    np.testing.assert_allclose(np.asarray(y)[kept], 2.0)


@pytest.mark.parametrize("act_before_norm", [False, True])
def test_conv_block_linear_groupnorm_parity_with_torch(act_before_norm):
    """Linear->GroupNorm->LeakyReLU (and the act-first ordering) must match a
    torch conv_block.py ConvBlock assembled from the same weights."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    x = rng.randn(6, 32).astype(np.float32)

    block = layers.ConvBlock(
        in_channels=32, out_channels=64, conv_cfg="Linear",
        norm_cfg={"type": "GroupNorm", "num_groups": 8},
        act_cfg="LeakyReLU", act_before_norm=act_before_norm,
    )
    params = block.init(jax.random.PRNGKey(1), jnp.asarray(x))
    out = np.asarray(block.apply(params, jnp.asarray(x)))

    dense = params["params"]["Dense_0"]
    tl = torch.nn.Linear(32, 64)
    with torch.no_grad():
        tl.weight.copy_(torch.from_numpy(np.asarray(dense["kernel"]).T))
        tl.bias.copy_(torch.from_numpy(np.asarray(dense["bias"])))
    tn = torch.nn.GroupNorm(8, 64)
    ta = torch.nn.LeakyReLU(0.2)
    with torch.no_grad():
        tx = tl(torch.from_numpy(x))
        # torch GroupNorm is channel-first: (N, C)
        tref = tn(ta(tx)) if act_before_norm else ta(tn(tx))
    np.testing.assert_allclose(out, tref.numpy(), rtol=1e-4, atol=1e-4)


def test_conv_block_bias_rule_and_conv_path():
    """BatchNorm after conv drops the conv bias (conv_block.py:45-50); the
    Conv1d path runs channel-last and batch-norm stats update under train."""
    block = layers.ConvBlock(
        in_channels=3, out_channels=5, conv_cfg="Conv1d", kernel_size=3,
        padding=1, norm_cfg="BatchNorm1d", act_cfg="ReLU",
    )
    x = jnp.asarray(np.random.RandomState(2).randn(2, 16, 3), jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), x)
    assert "bias" not in variables["params"]["Conv_0"]  # bias rule
    y, mutated = block.apply(variables, x, train=True, mutable=["batch_stats"])
    assert y.shape == (2, 16, 5)
    assert np.all(np.asarray(y) >= 0)  # ReLU applied
    before = variables["batch_stats"]["BatchNorm_0"]["mean"]
    after = mutated["batch_stats"]["BatchNorm_0"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))

    # act_before_norm keeps the bias even with BatchNorm
    block2 = layers.ConvBlock(
        in_channels=3, out_channels=5, conv_cfg="Linear",
        norm_cfg="BatchNorm1d", act_cfg=None, act_before_norm=True,
    )
    v2 = block2.init(jax.random.PRNGKey(0), x)
    assert "bias" in v2["params"]["Dense_0"]


def test_norm_factory_instance_norm_semantics():
    """InstanceNorm == per-channel per-sample normalization over space."""
    norm = layers.build_norm_layer(4, "InstanceNorm1d")
    x = jnp.asarray(np.random.RandomState(3).randn(2, 32, 4), jnp.float32)
    y = norm.init_with_output(jax.random.PRNGKey(0), x)[0]
    y = np.asarray(y)
    np.testing.assert_allclose(y.mean(axis=1), 0.0, atol=1e-5)
    np.testing.assert_allclose(y.std(axis=1), 1.0, atol=1e-3)
