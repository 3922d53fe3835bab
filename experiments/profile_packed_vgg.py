"""Per-stage timing of the fused packed VGG forward: find the remaining glue
(patch extraction / repack / pool / first+head layers) vs kernel time."""
import jax, jax.numpy as jnp
from qnx.bench.microbench import time_fn_marginal
from qnx.convert.pack_model import pack_vgg
from qnx.models.factory import init_model
from qnx.utils.config import CIFAR10_BNN

def main(batch=1024):
    cf = CIFAR10_BNN
    _, variables = init_model(cf, jax.random.PRNGKey(0))
    packed = pack_vgg(jax.device_get(variables), cf)
    images = jax.random.uniform(jax.random.PRNGKey(1), (batch, 32, 32, 3),
                                jnp.float32, -1.0, 1.0)

    first = jax.jit(lambda x, m: m.first(x))
    t = time_fn_marginal(first, images, packed, iters=16)
    print(f"first(float conv+BN+pack): {t*1e3:7.2f} ms")
    bits = first(images, packed)
    for i, layer in enumerate(packed.convs):
        f = jax.jit(lambda b, l: l(b))
        t = time_fn_marginal(f, bits, layer, iters=16)
        out = f(bits, layer)
        print(f"conv_{i+1} {bits.shape}->{out.shape} pool={layer.pool}: {t*1e3:7.2f} ms")
        bits = out
    b = bits.shape[0]
    bits = bits.reshape(b, -1)
    for j, layer in enumerate(packed.denses):
        f = jax.jit(lambda b, l: l(b))
        t = time_fn_marginal(f, bits, layer, iters=16)
        print(f"dense_{j} {bits.shape}: {t*1e3:7.2f} ms")
        bits = f(bits, layer)
    t = time_fn_marginal(jax.jit(lambda b, m: m.head(b)), bits, packed, iters=16)
    print(f"head: {t*1e3:7.2f} ms")

if __name__ == "__main__":
    main()
