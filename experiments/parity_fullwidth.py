"""Full-width on-chip parity artifact (VERDICT r2 items 1 & 6).

Runs the SHIPPED CIFAR-10 config shapes (width-128 VGG, 8192->1024 dense —
the VMEM-edge shapes never previously parity-asserted on TPU) end to end:

  short fake-quant training (synthetic CIFAR twin, real train_step)
    -> golden fake-quant logits  (float STE model)
    -> pack_vgg   (XNOR-popcount engine)   argmax parity
    -> pack_int8  (int8-MXU engine)        argmax parity
    -> write_legacy_h5 -> variables_from_keras_h5 -> both engines again
       (the reference-format checkpoint round trip at full size)

Prints one JSON line per engine with the argmax match fraction (must be
1.0) and a summary line for BASELINE.md.

Usage:  python experiments/parity_fullwidth.py [--batch 256] [--steps 8]
        [--network-type full-bnn|full-tnn]
"""
from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from qnx.convert.keras_h5 import variables_from_keras_h5, write_legacy_h5
from qnx.convert.pack_model import pack_int8, pack_vgg
from qnx.data.datasets import synthetic
from qnx.models.factory import build_model
from qnx.nn.int8_engine import i8_forward
from qnx.nn.inference import vgg_forward
from qnx.train.loop import create_train_state, train_step
from qnx.utils.config import CIFAR10_BNN, CIFAR10_TNN


def _legacy_layers(variables):
    """Serialize full-width VGG variables in the reference's legacy h5
    shape (model order: compute layer then its BN)."""
    p, s = variables["params"], variables["batch_stats"]
    compute = [f"conv_{i}" for i in range(6)] + ["dense_0", "dense_1",
                                                 "dense_out"]
    bns = [f"bn_conv_{i}" for i in range(6)] + ["bn_dense_0", "bn_dense_1",
                                                "bn_out"]
    out = []
    for cn, bn in zip(compute, bns):
        ws = [(f"{cn}/kernel:0", np.asarray(p[cn]["kernel"]))]
        if "bias" in p[cn]:
            ws.append((f"{cn}/bias:0", np.asarray(p[cn]["bias"])))
        out.append((cn, ws))
        out.append((bn, [(f"{bn}/gamma:0", np.asarray(p[bn]["scale"])),
                         (f"{bn}/beta:0", np.asarray(p[bn]["bias"])),
                         (f"{bn}/moving_mean:0", np.asarray(s[bn]["mean"])),
                         (f"{bn}/moving_variance:0", np.asarray(s[bn]["var"]))]))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--network-type", default="full-bnn",
                    choices=["full-bnn", "full-tnn"])
    ap.add_argument("--width", type=int, default=None,
                    help="override VGG width (CPU smoke runs)")
    ap.add_argument("--dense-units", type=int, default=None)
    args = ap.parse_args(argv)

    cf = (CIFAR10_BNN if args.network_type == "full-bnn" else CIFAR10_TNN)
    cf = cf.replace(dataset="synthetic-cifar", batch_size=64)
    if args.width:
        cf = cf.replace(width=args.width)
    if args.dense_units:
        cf = cf.replace(dense_units=args.dense_units)
    print(f"# devices={jax.devices()} config width={cf.width} "
          f"dense={cf.dense_units} type={cf.network_type}", file=sys.stderr)

    ds = synthetic((32, 32, 3), n_train=64 * args.steps, n_test=args.batch)
    state = create_train_state(cf, jax.random.PRNGKey(0),
                               steps_per_epoch=args.steps)
    xtr, ytr = jnp.asarray(ds.x_train), jnp.asarray(ds.y_train)
    for i in range(args.steps):
        state, m = train_step(state, xtr[i * 64:(i + 1) * 64],
                              ytr[i * 64:(i + 1) * 64])
    print(f"# trained {args.steps} steps, last loss={float(m['loss']):.4f}",
          file=sys.stderr)

    variables = jax.device_get({
        "params": state.params, "quant": state.quant,
        "batch_stats": state.batch_stats})
    x = jnp.asarray(ds.x_test)

    module = build_model(cf)
    gold = np.argmax(np.asarray(jax.jit(
        lambda v, x: module.apply(v, x, train=False))(
            {"params": state.params, "quant": state.quant,
             "batch_stats": state.batch_stats}, x)), -1)

    engines = {}
    if cf.network_type == "full-bnn":
        engines["popcount(pack_vgg)"] = lambda v: vgg_forward(
            pack_vgg(v, cf), x)
    else:
        from qnx.convert.pack_model import pack_vgg_bitplane
        from qnx.nn.inference import PlaneVGG

        engines["bitplane(pack_vgg_bitplane)"] = lambda v: jax.jit(
            lambda m, x: m(x))(pack_vgg_bitplane(v, cf), x)
    engines["int8-mxu(pack_int8)"] = lambda v: i8_forward(pack_int8(v, cf), x)

    import tempfile, os
    tmp = tempfile.mkdtemp()
    h5path = os.path.join(tmp, "fullwidth.h5")
    write_legacy_h5(h5path, _legacy_layers(variables))
    variables_h5 = variables_from_keras_h5(h5path, cf)

    ok = True
    for name, fn in engines.items():
        for src, v in (("native", variables), ("legacy-h5", variables_h5)):
            pred = np.argmax(np.asarray(fn(v)), -1)
            match = float(np.mean(pred == gold))
            ok &= match == 1.0
            print(json.dumps({
                "artifact": "fullwidth-parity", "engine": name,
                "weights_source": src, "network_type": cf.network_type,
                "width": cf.width, "batch": args.batch,
                "argmax_match_vs_fakequant": match,
                "backend": jax.default_backend()}))
    print(f"# PARITY {'OK' if ok else 'FAILED'} at width={cf.width} "
          f"batch={args.batch} on {jax.default_backend()}", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
