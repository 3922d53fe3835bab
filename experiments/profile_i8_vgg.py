"""Per-layer timing of the int8-MXU CIFAR VGG engine on the real chip."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from qnx.bench.microbench import time_fn_marginal
from qnx.convert.pack_model import pack_int8
from qnx.models.factory import init_model
from qnx.nn.int8_engine import i8_forward
from qnx.utils.config import CIFAR10_BNN

BATCH = 1024


def main():
    cf = CIFAR10_BNN
    _, variables = init_model(cf, jax.random.PRNGKey(0))
    model = pack_int8(jax.device_get(variables), cf)
    images = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, 32, 32, 3),
                                jnp.float32, -1.0, 1.0)

    # stage inputs
    x8_32 = model.first(images)                      # (B,32,32,128) int8
    acts = [x8_32]
    for layer in model.convs:
        acts.append(layer(acts[-1]))
    flat = acts[-1].reshape(BATCH, -1)

    total = time_fn_marginal(lambda x, m: i8_forward(m, x), images, model)
    print(f"TOTAL: {total*1e3:8.3f} ms", flush=True)

    t = time_fn_marginal(lambda x, m: jax.jit(lambda mm, xx: mm(xx))(m, x),
                         images, model.first)
    print(f"first conv f32 3->128 @32^2 : {t*1e3:8.3f} ms", flush=True)

    names = ["conv 128->128 @32^2 pool", "conv 128->256 @16^2",
             "conv 256->256 @16^2 pool", "conv 256->512 @8^2",
             "conv 512->512 @8^2 pool"]
    run = jax.jit(lambda mm, xx: mm(xx))
    for name, layer, xin in zip(names, model.convs, acts[:-1]):
        t = time_fn_marginal(lambda x, m: run(m, x), xin, layer)
        print(f"{name:28s}: {t*1e3:8.3f} ms", flush=True)

    x = flat
    for j, layer in enumerate(model.denses):
        t = time_fn_marginal(lambda xx, m: run(m, xx), x, layer)
        print(f"dense_{j:28d}: {t*1e3:8.3f} ms", flush=True)
        x = layer(x)
    t = time_fn_marginal(lambda xx, m: run(m, xx), x, model.head)
    print(f"head                        : {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
