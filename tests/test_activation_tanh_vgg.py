"""quantized_tanh VGG engine lowering (split from
test_activation_lowering.py — see test_activation_sigmoid_vgg.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qnx.convert.pack_model import pack_int8, pack_vgg_bitplane
from qnx.nn.int8_engine import i8_forward
from qnx.utils.config import Config

from engine_test_utils import _argmax_match, train_golden as _train

VGG_CF = Config(dataset="synthetic-cifar", architecture="vgg", width=8,
                dense_units=64, H=1.0)


class TestQuantizedTanhVGG:
    @pytest.fixture(scope="class", params=[False, True],
                    ids=["quant-head", "float-boundary"])
    def trained(self, request):
        cf = VGG_CF.replace(network_type="full-tnn", wbits=2, abits=2,
                            activation="quantized_tanh",
                            first_layer_float=request.param,
                            last_layer_float=request.param)
        ds, variables, gold = _train(cf, (32, 32, 3), steps=3)
        return cf, ds, variables, gold

    def test_bitplane_parity(self, trained):
        cf, ds, variables, gold = trained
        plane = pack_vgg_bitplane(variables, cf)
        out = np.asarray(jax.jit(lambda m, x: m(x))(
            plane, jnp.asarray(ds.x_test)))
        assert _argmax_match(out, gold) == 1.0

    def test_bitplane_uses_nb_planes_and_corr(self, trained):
        cf, ds, variables, _ = trained
        plane = pack_vgg_bitplane(variables, cf)
        planes = plane.first(jnp.asarray(ds.x_test[:2]))
        assert planes.shape[0] == cf.abits  # nb planes for unsigned u
        for layer in plane.convs:
            assert layer.corr is not None
            assert np.asarray(layer.corr).any()  # borders really corrected

    def test_int8_parity(self, trained):
        cf, ds, variables, gold = trained
        i8 = pack_int8(variables, cf)
        out = np.asarray(i8_forward(i8, jnp.asarray(ds.x_test)))
        assert _argmax_match(out, gold) == 1.0


