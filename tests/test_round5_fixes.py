"""Round-5 fixes: client drain race, >256 warmup ladder, upload_bf16
guard-rails (ADVICE.md r4), and the extended serving bucket rule."""

import threading
import warnings
from concurrent.futures import Future, InvalidStateError

import numpy as np
import pytest

from dirjax.server import Client, DynamicBatcher, IndexServer
from dirjax.serving import NQ_BUCKETS, RetrievalIndex, _nq_bucket


def _index(n=64, d=32, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return RetrievalIndex(x), x


class TestNqBucket:
    def test_ladder_below_256(self):
        for nq in (1, 2, 4, 5, 17, 128, 200, 256):
            b = _nq_bucket(nq)
            assert b >= nq and b in NQ_BUCKETS

    def test_256_rungs_above_ladder(self):
        assert _nq_bucket(257) == 512
        assert _nq_bucket(512) == 512
        assert _nq_bucket(513) == 768
        assert _nq_bucket(1000) == 1024

    def test_search_pads_above_256_to_a_rung(self):
        """A 300-row batch must compile the SAME shape as any other
        (256, 512]-row batch — the server-side guarantee that warmed
        rungs cover live coalesced sizes."""
        index, x = _index(n=700)
        q = np.concatenate([x] * 5)[:300]
        vals, idxs = index.search(q, k=3)
        assert vals.shape == (300, 3)
        assert np.all(idxs[:64, 0] == np.arange(64))  # self-match first


class TestWarmupLadder:
    def _spy_index(self, max_n=4096):
        calls = []
        index, x = _index()

        class Spy:
            dim = index.dim
            n = index.n
            NQ_BUCKETS = NQ_BUCKETS

            def search(self, q, k=10, **opts):
                calls.append(len(q))
                return index.search(np.asarray(q, np.float32)[:, :], k=k,
                                    **opts)

        return Spy(), calls

    def test_warmup_covers_rungs_past_256(self):
        spy, calls = self._spy_index()
        b = DynamicBatcher(spy, max_batch=600, max_wait_ms=0.0)
        b.warmup(k=3)
        # every coalesced size <= 600 pads to one of: ladder or {512, 768}
        padded = {_nq_bucket(c) for c in calls}
        for size in (1, 17, 300, 600):
            assert _nq_bucket(size) in padded, (size, sorted(padded))
        b.close()

    def test_warmup_unchanged_at_or_below_ladder(self):
        spy, calls = self._spy_index()
        b = DynamicBatcher(spy, max_batch=20, max_wait_ms=0.0)
        b.warmup(k=3)
        padded = {_nq_bucket(c) for c in calls}
        for size in (1, 4, 17, 20):
            assert _nq_bucket(size) in padded
        assert max(calls) <= 32   # never warms sizes the batcher can't emit
        b.close()


class TestUploadBf16Fp32Warning:
    def test_warns_on_fp32_dense_index(self):
        index, _ = _index()
        assert np.dtype(index.dtype) == np.float32
        with pytest.warns(UserWarning, match="fp32 dense"):
            b = DynamicBatcher(index, upload_bf16=True)
        b.close()

    def test_silent_on_bf16_index(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        x = rng.standard_normal((32, 16)).astype(np.float32)
        index = RetrievalIndex(x, dtype=jnp.bfloat16)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            b = DynamicBatcher(index, upload_bf16=True)
        b.close()


class TestClientDrainRace:
    def test_lost_set_exception_race_is_a_noop(self, tmp_path):
        """Force the exact interleaving ADVICE.md describes: _submit's
        loss path and the reader's drain both pass fut.done() before
        either resolves — the loser must swallow InvalidStateError and
        keep draining, leaving NO future unresolved."""
        index, x = _index()
        path = str(tmp_path / "race.sock")
        server = IndexServer(index, path, max_wait_ms=1.0)
        st = threading.Thread(target=server.serve_forever, daemon=True)
        st.start()
        c = Client(path)
        c.search(x[:1], k=3)          # reader thread is now alive

        # simulate the race directly on the pending deque: two threads
        # resolving the same not-yet-done futures concurrently, exactly
        # what _read_loop's drain and _submit's re-check do
        futs = [Future() for _ in range(64)]
        for f in futs:
            c._pending.append((f, False))
        c._dead = ConnectionError("injected")

        def resolver():
            for f in list(futs):
                if not f.done():
                    try:
                        f.set_exception(ConnectionError("loser"))
                    except InvalidStateError:
                        pass

        # kill the socket so the real reader runs its drain loop against
        # the injected entries while our thread races it
        c._sock.close()
        t = threading.Thread(target=resolver)
        t.start()
        t.join(timeout=5)
        if c._reader is not None:
            c._reader.join(timeout=5)
        # the guarantee under test: EVERY pending future got resolved
        for f in futs:
            assert f.done(), "drain stranded a future (the r4 hang)"
        with pytest.raises(Exception):
            futs[0].result()
        c.close()
        # shut the server down via a fresh connection
        with Client(path) as c2:
            c2.shutdown_server()
        st.join(timeout=10)
        assert not st.is_alive()
