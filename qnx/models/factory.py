"""Model zoo: ``build_model(cf) -> flax Module`` (reference
``models/model_factory.py``, SURVEY.md §2.1).

Two families, matching the reference and BASELINE.json configs:

* ``mlp`` — BinaryNet MNIST MLP (arXiv:1602.02830 §2): ``num_hidden`` dense
  layers of ``dim`` units, each Dense -> BatchNorm -> activation, then a
  Dense -> BatchNorm head (squared-hinge logits).
* ``vgg`` — BinaryNet/Moons CIFAR-10/SVHN ConvNet: three double-conv blocks
  (width, 2*width, 4*width channels) with 2x2 maxpool, then two dense layers
  and the head.  Block ordering is Conv -> [MaxPool] -> BatchNorm ->
  activation — pooling BEFORE BN+sign, which the packed engine reproduces by
  max-pooling the integer conv outputs (SURVEY.md §2.3 "Layer ordering").

The ``network_type``/``wbits``/``abits`` switch selects layer classes and
activations; ``first_layer_float``/``last_layer_float`` keep the boundary
layers full-precision (CIFAR configs), as in the BNN literature.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from qnx.train import layers as L
from qnx.utils.config import Config

Array = jax.Array


def _dense_cls(cf: Config, final: bool):
    if final and cf.last_layer_float:
        return lambda features, name: L.FloatDense(features, use_bias=True, name=name)
    kind = cf.weight_quantizer_name()
    common = dict(H=cf.H, use_bias=cf.use_bias,
                  kernel_lr_multiplier=cf.kernel_lr_multiplier)
    if kind == "float":
        return lambda features, name: L.FloatDense(features, use_bias=True, name=name)
    if kind == "binary":
        return lambda features, name: L.BinaryDense(
            features, stochastic=cf.stochastic, name=name, **common)
    if kind == "ternary":
        return lambda features, name: L.TernaryDense(
            features, style=cf.ternary_style, name=name, **common
        )
    return lambda features, name: L.QuantizedDense(
        features, nb=cf.wbits, name=name, **common
    )


def _conv_cls(cf: Config, first: bool):
    if first and cf.first_layer_float:
        return lambda features, name: L.FloatConv2D(
            features, (3, 3), use_bias=True, name=name
        )
    kind = cf.weight_quantizer_name()
    common = dict(kernel_size=(3, 3), H=cf.H, use_bias=cf.use_bias,
                  kernel_lr_multiplier=cf.kernel_lr_multiplier)
    if kind == "float":
        return lambda features, name: L.FloatConv2D(
            features, (3, 3), use_bias=True, name=name
        )
    if kind == "binary":
        return lambda features, name: L.BinaryConv2D(
            features, stochastic=cf.stochastic, name=name, **common)
    if kind == "ternary":
        return lambda features, name: L.TernaryConv2D(
            features, style=cf.ternary_style, name=name, **common
        )
    return lambda features, name: L.QuantizedConv2D(
        features, nb=cf.wbits, name=name, **common
    )


class QuantMLP(nn.Module):
    """BinaryNet-style MLP. Input NHWC image, flattened internally."""

    cf: Config

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cf = self.cf
        act = L.make_activation(cf.activation_name(), cf.abits)
        x = x.reshape(x.shape[0], -1)
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=cf.batch_norm_momentum,
            epsilon=cf.batch_norm_epsilon,
            name=name,
        )
        for i in range(cf.num_hidden):
            x = _dense_cls(cf, final=False)(cf.dim, f"dense_{i}")(x)
            x = bn(f"bn_{i}")(x)
            x = act(x)
            if cf.dropout_rate > 0:
                x = nn.Dropout(cf.dropout_rate, deterministic=not train)(x)
        x = _dense_cls(cf, final=True)(cf.classes, "dense_out")(x)
        x = bn("bn_out")(x)
        return x


class QuantVGG(nn.Module):
    """BinaryNet CIFAR-10/SVHN ConvNet: (2 conv + pool) x3, 2 dense, head."""

    cf: Config

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cf = self.cf
        act = L.make_activation(cf.activation_name(), cf.abits)
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=cf.batch_norm_momentum,
            epsilon=cf.batch_norm_epsilon,
            name=name,
        )
        widths = [cf.width, cf.width, 2 * cf.width, 2 * cf.width,
                  4 * cf.width, 4 * cf.width]
        for i, w in enumerate(widths):
            conv = _conv_cls(cf, first=(i == 0))(w, f"conv_{i}")
            x = conv(x)
            if i % 2 == 1:  # end of a double-conv block: pool BEFORE bn+act
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = bn(f"bn_conv_{i}")(x)
            x = act(x)
        x = x.reshape(x.shape[0], -1)
        for j in range(2):
            x = _dense_cls(cf, final=False)(cf.dense_units, f"dense_{j}")(x)
            x = bn(f"bn_dense_{j}")(x)
            x = act(x)
        x = _dense_cls(cf, final=True)(cf.classes, "dense_out")(x)
        x = bn("bn_out")(x)
        return x


def build_model(cf: Config) -> nn.Module:
    """The reference's ``build_model(cf) -> keras.Model`` equivalent."""
    if cf.architecture == "mlp":
        return QuantMLP(cf)
    if cf.architecture == "vgg":
        return QuantVGG(cf)
    raise ValueError(f"unknown architecture {cf.architecture!r}")


def init_model(cf: Config, rng: jax.Array):
    """Initialize params/state for a config; returns (module, variables).

    ``module.init`` is run under ``jax.jit`` so initialization is ONE
    compiled program instead of hundreds of eager op dispatches — on the
    relay-attached TPU each eager dispatch costs a remote round-trip, and
    un-jitted init of the full-width VGG was measured at ~7 MINUTES vs ~15 s
    jitted (round-4 bench-capture fix, VERDICT r3 #1)."""
    module = build_model(cf)
    dummy = jnp.zeros((1, *cf.input_shape), jnp.float32)
    variables = jax.jit(
        lambda r: module.init(r, dummy, train=False)
    )(rng)
    return module, variables
