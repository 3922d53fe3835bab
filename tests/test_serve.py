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


class TestServeRobustness:
    """Round-3 hardening: bounded stats, backpressure, clean stop, restart
    (VERDICT r2 item 7; SURVEY.md §5 feeder-restart tolerance)."""

    def test_stop_cancels_pending_futures(self, packed):
        # Engine never started: everything submitted stays queued; stop()
        # must cancel the futures so clients don't hang.
        eng = ServeEngine(packed, batch_size=4)
        futs = eng.submit_many(_images(6, seed=3))
        eng.stop()
        assert all(f.cancelled() for f in futs)
        with pytest.raises(RuntimeError, match="stopped"):
            eng.submit(_images(1, seed=3)[0])

    def test_backpressure_rejects_on_timeout(self, packed):
        import queue as _q
        eng = ServeEngine(packed, batch_size=4, max_queue=2)  # NOT started
        eng.submit_many(_images(2, seed=4))
        eng.submit_many(_images(2, seed=4))
        with pytest.raises(_q.Full):
            eng.submit_many(_images(2, seed=4), timeout=0.05)
        eng.stop()

    def test_backpressure_blocks_until_room(self, packed):
        # Started engine: a full queue drains, so a blocking submit returns.
        imgs = _images(2, seed=5)
        with ServeEngine(packed, batch_size=2, max_queue=1) as eng:
            futs = []
            for _ in range(8):
                futs.extend(eng.submit_many(imgs))  # blocks when full
            for f in futs:
                f.result(timeout=60)

    def test_feeder_restart_drains_correctly(self, packed):
        # Tear the engine down mid-stream, restart it, and verify the second
        # stream is served with correct results — the engine is stateless
        # between batches so a feeder-host restart loses only queued work.
        imgs = _images(8, seed=6)
        gold = np.asarray(mlp_forward(packed, jnp.asarray(imgs)))
        eng = ServeEngine(packed, batch_size=4)
        eng.start()
        first = eng.submit_many(imgs)
        eng.stop()  # mid-stream teardown
        for f in first:  # every future resolved: result or cancelled
            assert f.done() or f.cancelled()
        eng.start()  # feeder restart
        out = eng.predict(imgs)
        eng.stop()
        np.testing.assert_allclose(out, gold, atol=1e-5, rtol=1e-5)

    def test_latency_reservoir_bounded(self):
        from qnx.serve.engine import LATENCY_RESERVOIR, ServeStats
        st = ServeStats()
        for i in range(3 * LATENCY_RESERVOIR):
            st.record_latency(float(i % 97))
        assert len(st.latencies_ms) == LATENCY_RESERVOIR
        assert st.summary()["latency_samples"] == 3 * LATENCY_RESERVOIR

    def test_forward_exception_resolves_futures(self, packed):
        def bad_forward(m, x):
            raise RuntimeError("boom")
        eng = ServeEngine(packed, batch_size=4, forward=bad_forward)
        eng.start()
        futs = eng.submit_many(_images(2, seed=7))
        with pytest.raises(RuntimeError, match="boom"):
            futs[0].result(timeout=30)
        eng.stop()
