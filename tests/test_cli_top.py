"""Top-level ``python -m qnx`` CLI: train -> convert -> eval -> serve flow
on the offline digits dataset (in-process, CPU mesh)."""
import os
import pickle

import numpy as np
import pytest

from qnx.__main__ import main as qnx_main


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("run"))
    rc = qnx_main([
        "train", "--dataset", "digits", "--architecture", "mlp",
        "--network-type", "full-bnn", "--dim", "64", "--num-hidden", "2",
        "--h", "1.0", "--epochs", "5", "--batch-size", "64",
        "--lr-start", "5e-3", "--lr-end", "1e-3",
        "--out", out,
    ])
    assert rc == 0
    return out


def test_train_wrote_artifacts(run_dir):
    assert os.path.isdir(os.path.join(run_dir, "ckpt"))
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))


def test_eval_engines_agree(run_dir, capsys):
    accs = {}
    for engine in ("fake", "int8", "packed"):
        rc = qnx_main(["eval", "--ckpt", os.path.join(run_dir, "ckpt"),
                       "--engine", engine])
        assert rc == 0
        line = capsys.readouterr().out.strip().splitlines()[-1]
        accs[engine] = float(line.split(":")[1].split("(")[0])
    # packed-integer engines must reproduce the fake-quant accuracy exactly
    assert accs["int8"] == accs["fake"] == accs["packed"]
    assert accs["fake"] > 0.5  # 5 epochs on digits (test_train.py regime)


def test_convert_and_serve(run_dir, tmp_path, capsys):
    model_path = str(tmp_path / "model.pkl")
    rc = qnx_main(["convert", "--ckpt", os.path.join(run_dir, "ckpt"),
                   "--config", "mnist-bnn", "--engine", "int8",
                   "--out", model_path])
    assert rc == 0
    with open(model_path, "rb") as f:
        model = pickle.load(f)
    assert model is not None
    rc = qnx_main(["serve", "--model", model_path, "--batch-size", "32",
                   "--requests", "64", "--input-shape", "8,8,1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"images": 64' in out


def test_train_argparser_plumbs_round4_flags():
    """--activation / --resume / --ckpt-every reach the Config / fit call
    (pure arg plumbing, no training)."""
    from qnx.train.__main__ import build_argparser, config_from_args

    args = build_argparser().parse_args([
        "--config", "mnist-bnn", "--activation", "quantized_tanh",
        "--ckpt-every", "5", "--resume"])
    cf = config_from_args(args)
    assert cf.activation == "quantized_tanh"
    assert cf.activation_name() == "quantized_tanh"
    assert args.ckpt_every == 5 and args.resume is True
    # no override -> derived activation unchanged
    args = build_argparser().parse_args(["--config", "mnist-bnn"])
    assert config_from_args(args).activation is None


def test_resume_of_completed_run_is_graceful(run_dir, capsys):
    """--resume with the same --epochs on a finished run: 'nothing to do',
    rc 0, no IndexError."""
    rc = qnx_main([
        "train", "--dataset", "digits", "--architecture", "mlp",
        "--network-type", "full-bnn", "--dim", "64", "--num-hidden", "2",
        "--h", "1.0", "--epochs", "5", "--batch-size", "64",
        "--lr-start", "5e-3", "--lr-end", "1e-3",
        "--out", run_dir, "--resume",
    ])
    assert rc == 0
    assert "nothing to do" in capsys.readouterr().out


def test_packed_engine_dispatch_reaches_bitplane():
    """--engine packed on an abits>1 VGG config must resolve to the
    bitplane engine (round 5 — previously the CLI raised pack_vgg's
    abits error, making PlaneVGG unreachable from the CLI)."""
    import jax
    import jax.numpy as jnp

    from engine_test_utils import VGG_CF, train_golden
    from qnx.__main__ import _engine_forward, _pack_for_engine
    from qnx.nn.inference import PlaneVGG

    cf = VGG_CF.replace(network_type="full-tnn", wbits=2, abits=2)
    ds, variables, gold = train_golden(cf, (32, 32, 3))
    model = _pack_for_engine(variables, cf, "packed")
    assert isinstance(model, PlaneVGG)
    out = _engine_forward(model)(model, jnp.asarray(ds.x_test))
    assert (np.argmax(np.asarray(out), -1) == np.argmax(gold, -1)).all()
