"""CLI + checkpoint/resume + metrics tests."""
import json
import os

import jax
import numpy as np
import pytest

from qnx.train.checkpoint import load_checkpoint, save_checkpoint
from qnx.models.factory import init_model
from qnx.utils.config import Config
from qnx.utils.metrics import MetricsLogger

CF = Config(dataset="digits", architecture="mlp", dim=32, num_hidden=2,
            network_type="full-bnn", H=1.0, epochs=1, batch_size=64)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        _, variables = init_model(CF, jax.random.PRNGKey(0))
        path = save_checkpoint(str(tmp_path / "ckpt"), variables, CF)
        restored, cf2 = load_checkpoint(path)
        assert cf2 == CF
        np.testing.assert_array_equal(
            np.asarray(variables["params"]["dense_0"]["kernel"]),
            np.asarray(restored["params"]["dense_0"]["kernel"]))
        np.testing.assert_array_equal(
            np.asarray(variables["batch_stats"]["bn_0"]["var"]),
            np.asarray(restored["batch_stats"]["bn_0"]["var"]))

    def test_checkpoint_converts(self, tmp_path):
        from qnx.convert.pack_model import pack_mlp
        from qnx.nn.inference import mlp_forward
        import jax.numpy as jnp

        _, variables = init_model(CF, jax.random.PRNGKey(0))
        path = save_checkpoint(str(tmp_path / "ckpt"), variables, CF)
        restored, cf2 = load_checkpoint(path)
        packed = pack_mlp(jax.device_get(restored), cf2)
        out = mlp_forward(packed, jnp.zeros((2, 8, 8, 1)))
        assert out.shape == (2, 10)


class TestMetrics:
    def test_jsonl_log(self, tmp_path):
        path = str(tmp_path / "m.jsonl")
        log = MetricsLogger(path)
        log.log(event="epoch", epoch=0, acc=np.float32(0.5))
        log.log(event="done", values=[1, 2])
        log.close()
        lines = [json.loads(l) for l in open(path)]
        assert lines[0]["event"] == "epoch"
        assert isinstance(lines[0]["acc"], float)
        assert lines[1]["values"] == [1, 2]


class TestCli:
    def test_end_to_end_digits(self, tmp_path):
        from qnx.train.__main__ import main

        out = str(tmp_path / "run")
        rc = main(["--dataset", "digits", "--architecture", "mlp",
                   "--network-type", "full-bnn", "--dim", "32",
                   "--num-hidden", "2", "--epochs", "1",
                   "--batch-size", "64", "--h", "1.0",
                   "--out", out, "--convert", "int8"])
        assert rc == 0
        assert os.path.exists(os.path.join(out, "metrics.jsonl"))
        assert os.path.exists(os.path.join(out, "model.int8.pkl"))
        events = [json.loads(l)["event"]
                  for l in open(os.path.join(out, "metrics.jsonl"))]
        assert "start" in events and "done" in events

    def test_preset_config(self):
        from qnx.train.__main__ import build_argparser, config_from_args

        args = build_argparser().parse_args(
            ["--config", "cifar10-bnn", "--epochs", "2"])
        cf = config_from_args(args)
        assert cf.architecture == "vgg"
        assert cf.first_layer_float
        assert cf.epochs == 2
