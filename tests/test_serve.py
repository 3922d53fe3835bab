"""Serving engine tests: continuous batching correctness (results match
direct forward, order preserved), padding of partial batches, stats, and the
TP-sharded multi-device path on the CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qnx.convert.pack_model import pack_mlp
from qnx.models.factory import init_model
from qnx.nn.inference import mlp_forward
from qnx.serve.engine import ServeEngine
from qnx.utils.config import Config

CF = Config(dataset="digits", architecture="mlp", dim=64, num_hidden=2,
            network_type="full-bnn", H=1.0)


@pytest.fixture(scope="module")
def packed():
    _, variables = init_model(CF, jax.random.PRNGKey(0))
    return pack_mlp(jax.device_get(variables), CF)


def _images(n, seed=0):
    return np.asarray(jax.random.uniform(
        jax.random.PRNGKey(seed), (n, 8, 8, 1), minval=-1, maxval=1))


class TestServeEngine:
    def test_results_match_direct_forward(self, packed):
        imgs = _images(10)
        gold = np.asarray(mlp_forward(packed, jnp.asarray(imgs)))
        with ServeEngine(packed, batch_size=4) as eng:
            out = eng.predict(imgs)
        np.testing.assert_allclose(out, gold, atol=1e-5, rtol=1e-5)

    def test_partial_batch_padding(self, packed):
        imgs = _images(3, seed=1)  # < batch_size -> one padded batch
        gold = np.asarray(mlp_forward(packed, jnp.asarray(imgs)))
        with ServeEngine(packed, batch_size=16) as eng:
            out = eng.predict(imgs)
            stats = eng.stats()
        np.testing.assert_allclose(out, gold, atol=1e-5, rtol=1e-5)
        assert stats["images"] == 3
        assert stats["pad_fraction"] > 0

    def test_stats_throughput(self, packed):
        imgs = _images(32, seed=2)
        with ServeEngine(packed, batch_size=8) as eng:
            eng.predict(imgs)
            stats = eng.stats()
        assert stats["images"] == 32
        assert stats["batches"] >= 4
        assert stats["throughput_ips"] > 0
        assert stats["latency_ms_p99"] >= stats["latency_ms_p50"]

    def test_sharded_mesh_path(self, packed):
        if jax.device_count() < 2:
            pytest.skip("needs multi-device mesh")
        from qnx.parallel.mesh import make_mesh

        mesh = make_mesh(model_parallel=2)
        imgs = _images(8, seed=3)
        gold = np.asarray(mlp_forward(packed, jnp.asarray(imgs)))
        with ServeEngine(packed, batch_size=8, mesh=mesh) as eng:
            out = eng.predict(imgs)
        np.testing.assert_allclose(out, gold, atol=1e-5, rtol=1e-5)

    def test_streaming_interleaved_submits(self, packed):
        """Requests arriving while a batch is in flight still resolve and
        preserve per-request identity."""
        imgs = _images(20, seed=4)
        gold = np.asarray(mlp_forward(packed, jnp.asarray(imgs)))
        with ServeEngine(packed, batch_size=4, max_wait_ms=1.0) as eng:
            futs = []
            for i, im in enumerate(imgs):
                futs.append(eng.submit(im))
            out = np.stack([f.result(timeout=120) for f in futs])
        np.testing.assert_allclose(out, gold, atol=1e-5, rtol=1e-5)


class TestUint8Ingest:
    def test_uint8_requests_normalized_natively(self, packed):
        """uint8 requests are normalized to [-1,1] in the dispatcher via the
        native host runtime and give the same logits as pre-normalized f32."""
        rng = np.random.RandomState(3)
        raw = rng.randint(0, 256, (6, 8, 8, 1), np.uint8)
        from qnx.native import u8_to_f32

        gold = np.asarray(mlp_forward(packed, jnp.asarray(u8_to_f32(raw))))
        with ServeEngine(packed, batch_size=4) as eng:
            out = eng.predict(raw)
        np.testing.assert_allclose(out, gold, atol=1e-5, rtol=1e-5)


class TestChunkedSubmission:
    def test_chunk_split_across_batches(self, packed):
        """A chunk larger than batch_size splits; remainder carries over."""
        imgs = _images(10, seed=4)
        gold = np.asarray(mlp_forward(packed, jnp.asarray(imgs)))
        with ServeEngine(packed, batch_size=4) as eng:
            futs = eng.submit_many(imgs)  # 10 > 4 -> 3 batches via carry
            out = np.stack([f.result(timeout=300) for f in futs])
            stats = eng.stats()
        np.testing.assert_allclose(out, gold, atol=1e-5, rtol=1e-5)
        assert stats["images"] == 10

    def test_interleaved_single_and_chunked(self, packed):
        imgs = _images(7, seed=5)
        gold = np.asarray(mlp_forward(packed, jnp.asarray(imgs)))
        with ServeEngine(packed, batch_size=4, max_wait_ms=50) as eng:
            f0 = eng.submit(imgs[0])
            fs = eng.submit_many(imgs[1:5])
            f1 = eng.submit(imgs[5])
            f2 = eng.submit(imgs[6])
            out = np.stack([f.result(timeout=300)
                            for f in [f0, *fs, f1, f2]])
        np.testing.assert_allclose(out, gold, atol=1e-5, rtol=1e-5)
