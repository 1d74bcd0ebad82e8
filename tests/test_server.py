"""Dynamic-batching serving front-end (dirjax/server.py).

All on the CPU harness: the batcher/server are pure host code around
``index.search``, so correctness here transfers to the TPU unchanged."""

import threading

import numpy as np
import pytest

from dirjax.server import Client, DynamicBatcher, IndexServer
from dirjax.serving import RetrievalIndex


def _index(n=64, d=32, seed=0, keys=False):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    ks = [f"img{i}.jpg" for i in range(n)] if keys else None
    return RetrievalIndex(x, keys=ks), x


class TestDynamicBatcher:
    def test_matches_direct_search_under_concurrency(self):
        index, x = _index()
        batcher = DynamicBatcher(index, max_batch=64, max_wait_ms=80.0)
        rng = np.random.default_rng(1)
        reqs = [x[rng.integers(0, len(x), size=rng.integers(1, 4))]
                for _ in range(16)]
        futs = [None] * len(reqs)
        barrier = threading.Barrier(len(reqs))

        def fire(i):
            barrier.wait()
            futs[i] = batcher.submit(reqs[i], k=5)

        threads = [threading.Thread(target=fire, args=(i,))
                   for i in range(len(reqs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, q in enumerate(reqs):
            vals, idxs = futs[i].result(timeout=60)
            ev, ei = index.search(q, k=5)
            np.testing.assert_array_equal(idxs, ei)
            np.testing.assert_allclose(vals, ev, atol=1e-5)
        # the whole point: concurrent requests shared device dispatches
        assert batcher.stats["batches"] < batcher.stats["requests"]
        assert batcher.stats["batched_rows"] == batcher.stats["rows"]
        batcher.close()

    def test_pipelined_matches_serial(self):
        """pipeline>1 dispatches batches on concurrent workers; every
        request must still get exactly its own slice, identical to the
        strictly serial batcher."""
        index, x = _index(n=96)
        serial = DynamicBatcher(index, max_batch=16, max_wait_ms=0.0,
                                pipeline=1)
        piped = DynamicBatcher(index, max_batch=16, max_wait_ms=0.0,
                               pipeline=4)
        rng = np.random.default_rng(7)
        reqs = [x[rng.integers(0, len(x), size=rng.integers(1, 6))]
                for _ in range(40)]
        f_s = [serial.submit(q, k=4) for q in reqs]
        f_p = [piped.submit(q, k=4) for q in reqs]
        for q, fs, fp in zip(reqs, f_s, f_p):
            vs, is_ = fs.result(timeout=60)
            vp, ip = fp.result(timeout=60)
            np.testing.assert_array_equal(is_, ip)
            np.testing.assert_allclose(vs, vp, atol=1e-6)
            assert vp.shape == (len(q), 4)
        assert piped.stats["batched_rows"] == piped.stats["rows"]
        piped.close()
        serial.close()

    def test_upload_bf16_matches_f32_on_bf16_index(self):
        """Host-side bf16 conversion (halves query upload bytes) must be
        a no-op for a bf16 index — its search casts queries to bf16
        anyway."""
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        x = rng.standard_normal((128, 32)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        index = RetrievalIndex(jnp.asarray(x, jnp.bfloat16),
                               dtype=jnp.bfloat16)
        plain = DynamicBatcher(index, max_batch=8, max_wait_ms=0.0)
        bf16 = DynamicBatcher(index, max_batch=8, max_wait_ms=0.0,
                              upload_bf16=True)
        bf16.warmup(k=5)
        q = x[:4] + 0.01 * rng.standard_normal((4, 32)).astype(np.float32)
        v1, i1 = plain.search(q, k=5)
        v2, i2 = bf16.search(q, k=5)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(v1, v2, rtol=1e-6)
        plain.close()
        bf16.close()

    def test_upload_bf16_pq_close_to_f32(self):
        """For PQ the bf16 rounding lands before the LUT build — scores
        must stay within the tier's own quantization noise."""
        from dirjax.serving import PQIndex

        rng = np.random.default_rng(4)
        x = rng.standard_normal((400, 32)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        index = PQIndex(x, m=4, ksub=16, train_iters=5)
        plain = DynamicBatcher(index, max_batch=8, max_wait_ms=0.0)
        bf16 = DynamicBatcher(index, max_batch=8, max_wait_ms=0.0,
                              upload_bf16=True)
        v1, _ = plain.search(x[:4], k=5)
        v2, _ = bf16.search(x[:4], k=5)
        np.testing.assert_allclose(v1, v2, rtol=0.02, atol=0.02)
        plain.close()
        bf16.close()

    def test_pipelined_close_flushes_inflight(self):
        index, x = _index()
        b = DynamicBatcher(index, max_batch=4, max_wait_ms=50.0,
                           pipeline=3)
        futs = [b.submit(x[i:i + 2], k=3) for i in range(0, 20, 2)]
        b.close()   # must resolve every future, not drop in-flight work
        for f in futs:
            vals, idxs = f.result(timeout=5)
            assert vals.shape == (2, 3)

    def test_signatures_batch_separately(self):
        index, x = _index()
        batcher = DynamicBatcher(index, max_batch=8, max_wait_ms=40.0)
        f1 = batcher.submit(x[:2], k=3)
        f2 = batcher.submit(x[2:4], k=7)
        f3 = batcher.submit(x[4:5], k=3, aqe={"k": 2, "alpha": 1.0})
        assert f1.result(timeout=60)[0].shape == (2, 3)
        assert f2.result(timeout=60)[0].shape == (2, 7)
        assert f3.result(timeout=60)[0].shape == (1, 3)
        # k=3 plain, k=7 plain, k=3+aqe: three distinct dispatches
        assert batcher.stats["batches"] == 3
        batcher.close()

    def test_oversized_request_and_max_batch_split(self):
        index, x = _index()
        batcher = DynamicBatcher(index, max_batch=4, max_wait_ms=0.0)
        vals, idxs = batcher.search(x[:10], k=4)   # 10 rows > max_batch
        ev, ei = index.search(x[:10], k=4)
        np.testing.assert_array_equal(idxs, ei)
        batcher.close()

    def test_coalescing_never_overshoots_max_batch(self):
        """Batches formed by coalescing must stay <= max_batch: overshoot
        sizes fall past the warmed bucket ladder and compile on live
        traffic. Only a single oversized request may exceed it."""
        calls = []

        class Spy:
            dim = 8

            def search(self, q, k=10, **opts):
                calls.append(len(q))
                return (np.zeros((len(q), k), np.float32),
                        np.zeros((len(q), k), np.int32))

        b = DynamicBatcher(Spy(), max_batch=16, max_wait_ms=200.0,
                           pipeline=1)
        qs = np.zeros((10, 8), np.float32)
        futs = [b.submit(qs, k=3) for _ in range(4)]   # 40 rows pending
        for f in futs:
            f.result(timeout=30)
        assert all(c <= 16 for c in calls), calls     # 10+10 > 16 never
        big = b.submit(np.zeros((23, 8), np.float32), k=3)  # oversized
        big.result(timeout=30)
        assert 23 in calls
        b.close()

    def test_search_error_propagates_to_caller(self):
        index, _ = _index()
        batcher = DynamicBatcher(index, max_batch=8, max_wait_ms=0.0)
        with pytest.raises(ValueError, match="dim"):
            batcher.submit(np.zeros((1, 7), np.float32))
        fut = batcher.submit(np.zeros((1, index.dim), np.float32),
                             k=index.n + 5)   # k > n: index.search raises
        with pytest.raises(Exception):
            fut.result(timeout=60)
        batcher.close()

    def test_close_flushes_pending(self):
        index, x = _index()
        batcher = DynamicBatcher(index, max_batch=1024,
                                 max_wait_ms=10_000.0)
        fut = batcher.submit(x[:3], k=2)   # would wait 10 s for friends
        batcher.close()                    # must flush, not abandon
        vals, idxs = fut.result(timeout=1)
        assert vals.shape == (3, 2)
        with pytest.raises(RuntimeError, match="closed"):
            batcher.submit(x[:1])


class TestIndexServer:
    def _serve(self, index, tmp_path, **kw):
        path = str(tmp_path / "dirjax.sock")
        server = IndexServer(index, path, **kw)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        return server, t, path

    def test_roundtrip_with_keys(self, tmp_path):
        index, x = _index(keys=True)
        server, t, path = self._serve(index, tmp_path, max_wait_ms=1.0)
        with Client(path) as c:
            vals, idxs, keys = c.search(x[:3], k=4, keys=True)
            ev, ei = index.search(x[:3], k=4)
            np.testing.assert_array_equal(idxs, ei)
            np.testing.assert_allclose(vals, ev, atol=1e-5)
            assert keys == index.lookup(ei)
            # single-vector convenience + option passthrough
            va, ia = c.search(x[0], k=2, aqe={"k": 2, "alpha": 1.0})
            ea, eia = index.search(x[:1], k=2, aqe={"k": 2, "alpha": 1.0})
            np.testing.assert_array_equal(ia, eia)
            c.shutdown_server()
        t.join(timeout=10)
        assert not t.is_alive()

    def test_concurrent_clients_coalesce(self, tmp_path):
        index, x = _index()
        server, t, path = self._serve(index, tmp_path, max_batch=64,
                                      max_wait_ms=80.0)
        results = {}
        barrier = threading.Barrier(8)

        def worker(i):
            with Client(path) as c:
                barrier.wait()
                results[i] = c.search(x[i:i + 2], k=3)

        ws = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
        for w in ws:
            w.start()
        for w in ws:
            w.join()
        for i in range(8):
            _, idxs = results[i]
            np.testing.assert_array_equal(idxs,
                                          index.search(x[i:i + 2], k=3)[1])
        assert server.batcher.stats["batches"] \
            < server.batcher.stats["requests"]
        with Client(path) as c:
            c.shutdown_server()
        t.join(timeout=10)

    def test_server_error_reply_keeps_connection(self, tmp_path):
        index, x = _index()   # no keys
        server, t, path = self._serve(index, tmp_path, max_wait_ms=1.0)
        with Client(path) as c:
            with pytest.raises(RuntimeError, match="server error"):
                c.search(x[:1], k=2, keys=True)   # keyless index
            vals, idxs = c.search(x[:1], k=2)     # still serviceable
            assert vals.shape == (1, 2)
            c.shutdown_server()
        t.join(timeout=10)

    def test_tcp_transport(self):
        # host:port addresses use TCP; port 0 -> kernel picks, published
        # via server.address. Same protocol as UDS.
        index, x = _index(keys=True)
        server = IndexServer(index, "127.0.0.1:0", max_wait_ms=1.0)
        assert server.socket_path is None        # no file to unlink
        host, port = server.address.rsplit(":", 1)
        assert host == "127.0.0.1" and int(port) > 0
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        with Client(server.address) as c:
            vals, idxs, keys = c.search(x[:2], k=3, keys=True)
            np.testing.assert_array_equal(idxs, index.search(x[:2], k=3)[1])
            assert keys == index.lookup(idxs)
            c.shutdown_server()
        t.join(timeout=10)
        assert not t.is_alive()

    def test_shared_client_is_thread_safe(self, tmp_path):
        # many threads on ONE Client: requests serialize on the socket
        # (frames must not interleave), results stay per-caller correct
        index, x = _index()
        server, t, path = self._serve(index, tmp_path, max_wait_ms=1.0)
        with Client(path) as c:
            results = {}
            barrier = threading.Barrier(8)

            def worker(i):
                barrier.wait()
                results[i] = c.search(x[i:i + 2], k=3)

            ws = [threading.Thread(target=worker, args=(i,))
                  for i in range(8)]
            for w in ws:
                w.start()
            for w in ws:
                w.join()
            for i in range(8):
                np.testing.assert_array_equal(
                    results[i][1], index.search(x[i:i + 2], k=3)[1])
            c.shutdown_server()
        t.join(timeout=10)

    def test_search_async_pipelines_one_connection(self, tmp_path):
        """N requests in flight on ONE socket: futures resolve in request
        order with each request's own correct slice, and errors resolve
        only the matching future."""
        index, x = _index()
        server, t, path = self._serve(index, tmp_path, max_wait_ms=1.0)
        with Client(path) as c:
            futs = [c.search_async(x[i:i + 2], k=3) for i in range(10)]
            bad = c.search_async(np.zeros((1, 7), np.float32), k=3)
            after = c.search_async(x[:2], k=3)
            for i, f in enumerate(futs):
                vals, idxs = f.result(timeout=60)
                np.testing.assert_array_equal(
                    idxs, index.search(x[i:i + 2], k=3)[1])
            with pytest.raises(RuntimeError, match="server error"):
                bad.result(timeout=60)
            vals, idxs = after.result(timeout=60)   # conn survives errors
            np.testing.assert_array_equal(idxs, index.search(x[:2], k=3)[1])
            c.shutdown_server()
        t.join(timeout=10)

    def test_async_futures_fail_on_connection_loss(self, tmp_path):
        index, x = _index()
        server, t, path = self._serve(index, tmp_path, max_wait_ms=1.0)
        c = Client(path)
        f = c.search_async(x[:2], k=3)
        f.result(timeout=60)          # reader thread is live
        c.shutdown_server()
        t.join(timeout=10)
        # the server is gone: new submits must RAISE (a TCP send into a
        # half-closed socket can succeed — without the dead-flag check
        # the future would hang forever)
        deadline = threading.Event()
        for _ in range(50):           # reader notices loss asynchronously
            try:
                fut = c.search_async(x[:2], k=3)
                fut.result(timeout=5)
            except (ConnectionError, OSError, RuntimeError):
                break
            deadline.wait(0.05)
        else:
            raise AssertionError("submits after connection loss neither "
                                 "raised nor failed the future")
        c.close()

    def test_addr_parsing(self):
        import socket as so

        from dirjax.server import _parse_addr
        assert _parse_addr("/tmp/a.sock") == (so.AF_UNIX, "/tmp/a.sock")
        assert _parse_addr("relative.sock") == (so.AF_UNIX, "relative.sock")
        # a path with a digit suffix after ':' is still UDS if it has '/'
        assert _parse_addr("/tmp/x:123")[0] == so.AF_UNIX
        assert _parse_addr("127.0.0.1:80") == (so.AF_INET,
                                               ("127.0.0.1", 80))
        assert _parse_addr(":8080") == (so.AF_INET, ("0.0.0.0", 8080))

    def test_latency_stats(self):
        index, x = _index()
        batcher = DynamicBatcher(index, max_batch=8, max_wait_ms=0.0)
        assert batcher.latency_stats() == {}
        for i in range(5):
            batcher.search(x[i:i + 1], k=3)
        lat = batcher.latency_stats()
        assert set(lat) == {"p50_ms", "p90_ms", "p99_ms", "mean_ms",
                            "max_ms"}
        assert 0.0 < lat["p50_ms"] <= lat["p99_ms"] <= lat["max_ms"]
        batcher.close()

    def test_warmup_compiles_buckets_and_resets_stats(self):
        index, x = _index()
        batcher = DynamicBatcher(index, max_batch=16, max_wait_ms=0.0)
        batcher.warmup(k=3)          # every bucket <= max_batch + 16
        assert batcher.latency_stats() == {}   # window cleared
        vals, idxs = batcher.search(x[:2], k=3)
        assert idxs.shape == (2, 3) and batcher.latency_stats()
        batcher.reset_latency_stats()
        assert batcher.latency_stats() == {}
        batcher.close()

    def test_cli_main_serves_ivf_index(self, tmp_path):
        from dirjax.cli.index import main as index_main
        from dirjax.server import main as serve_main

        rng = np.random.default_rng(3)
        x = rng.standard_normal((200, 32)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        dp = str(tmp_path / "db.npy")
        np.save(dp, x)
        ip = str(tmp_path / "ivf.npz")
        index_main(["build", "--descs", dp, "--ivf", "4", "--pq", "4",
                    "--pq-ksub", "8", "--out", ip, "--gpu", "-1"])
        path = str(tmp_path / "srv.sock")
        t = threading.Thread(
            target=serve_main,
            args=(["--index", ip, "--socket", path, "--max-wait-ms", "1",
                   "--gpu", "-1"],),
            daemon=True)
        t.start()
        with Client(path) as c:
            _, idxs = c.search(x[:4], k=3, nprobe=4)
            assert idxs[0, 0] == 0   # self-match first
            c.shutdown_server()
        t.join(timeout=30)
        assert not t.is_alive()
