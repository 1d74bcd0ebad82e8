"""dirjax benchmark — run on real TPU hardware by the round driver.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Primary metric: ResNet-101-GeM descriptor extraction throughput (images/sec,
bf16, 1024x768 inputs, single chip) — the hot path of the reference's
``test_dir.py``/``extract_features.py``. Extras: ResNet-50 throughput,
fused ranking QPS at a 1M x 2048-descriptor database, and the descriptor-head
kernel time.

Baseline assumption (documented, reference publishes no throughput numbers —
SURVEY.md §6): PyTorch fp32 on a V100 runs ResNet-101 GeM extraction at
~40 img/s at 1024x768. BASELINE.json's target is >5x PyTorch-GPU on a v5e-8
(8 chips), i.e. ~200 img/s fleet-wide = 25 img/s per chip.
``vs_baseline`` = measured single-chip img/s / 25; >1.0 meets the scaled
target on this one-chip harness.

Measurement notes for this harness:
* host<->device transfers ride a tunnel whose cost is ROUND-TRIP dominated
  and state-dependent: a quiet stream moves 2 MB in ~1.8 ms (~1 GB/s), a
  busy one serializes ~43 ms per upload and ~28 ms per result pull
  (PERF_NOTES "Index server", r4) — all benchmark data is still generated
  on device and pulls are kept off timed paths;
* a blocking device round-trip costs ~30 ms — timing runs N iterations
  inside one jitted fori_loop with a data dependence between iterations so
  XLA cannot collapse them, and divides by N;
* the persistent compilation cache is enabled so repeat runs skip the
  (potentially multi-minute) tunnel compiles.
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

GPU_BASELINE_IMG_PER_SEC = 40.0     # assumed PyTorch-V100 fp32, R101@1024x768
TARGET_MULTIPLIER = 5.0             # BASELINE.json: >5x PyTorch-GPU
CHIPS_IN_TARGET_POD = 8.0           # v5e-8
PER_CHIP_TARGET = GPU_BASELINE_IMG_PER_SEC * TARGET_MULTIPLIER / CHIPS_IN_TARGET_POD


def _sync(x) -> float:
    """Force completion with a host pull (block_until_ready is unreliable
    through the tunnel)."""
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def _timed_loop(fn, init_args, n_iter: int) -> float:
    """Marginal seconds per iteration of ``fn`` on device.

    Runs the op chained inside one jitted fori_loop (data dependence between
    iterations so XLA can't collapse them) at two iteration counts and
    reports the slope — the tunnel adds a tens-of-ms fixed dispatch cost per
    call that would otherwise swamp the measurement.
    """

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(args, n):
        def body(_, carry):
            first, rest, feedback = carry
            out = fn(first + feedback, *rest)
            # NB: *0.0 would constant-fold and let XLA hoist the body out of
            # the loop; 1e-30 keeps a real data dependence while being far
            # below fp32/bf16 resolution of the inputs
            fb = (jnp.sum(out).astype(jnp.float32) * 1e-30).astype(first.dtype)
            return (first, rest, fb)

        first, *rest = args
        zero = jnp.zeros((), first.dtype)
        _, _, fb = jax.lax.fori_loop(0, n, body, (first, tuple(rest), zero))
        return fb

    n_lo, n_hi = max(1, n_iter // 4), n_iter
    for n in (n_lo, n_hi):                    # compile both variants
        _sync(loop(tuple(init_args), n))
    _sync(loop(tuple(init_args), n_lo))       # warm

    def best_of(n, reps=3):
        # min over repetitions rejects host-side scheduling noise (the
        # tunnel dispatch cost varies tens of ms under load)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _sync(loop(tuple(init_args), n))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = best_of(n_lo), best_of(n_hi)
    return max(t_hi - t_lo, 1e-9) / (n_hi - n_lo)


def bench_descriptor_throughput(arch: str, batch: int, hw, n_iter: int = 16,
                                masked: bool = False):
    """``masked=True`` measures the bucket-mode path: images padded onto a
    canvas with a validity mask and masked GeM pooling (the throughput mode
    of extraction for variable-size corpora)."""
    from dirjax.models import create_model
    from dirjax.models.rmac import apply_descriptor

    model = create_model(arch)
    params = model.init(jax.random.PRNGKey(0))
    cfg = model.config
    h, w = hw
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, h, w, 3), jnp.float32)
    if masked:
        # ~90% valid rows/cols: a typical padded bucket occupancy
        mask = (jnp.arange(h)[None, :, None] < int(h * 0.94)) & \
               (jnp.arange(w)[None, None, :] < int(w * 0.96))
        mask = jnp.broadcast_to(mask, (batch, h, w))

        def fwd(images, params):
            return apply_descriptor(params, images, cfg, mask=mask,
                                    dtype=jnp.bfloat16)
    else:
        def fwd(images, params):
            return apply_descriptor(params, images, cfg, dtype=jnp.bfloat16)

    sec = _timed_loop(fwd, (x, params), n_iter)
    return batch / sec


def bench_ranking_qps(n_db: int = 1_000_000, dim: int = 2048, nq: int = 64,
                      k: int = 100, n_iter: int = 10, int8: bool = False,
                      int8_queries: bool = False, _cache={}):
    """Eager serving pattern: successive query batches dispatched
    back-to-back (async), one sync at the end. NOT wrapped in an outer jit —
    the staged ranking path relies on its internal jit boundaries
    (fusing them measured 2x slower). ``int8=True`` measures the quantized-
    database path (half the HBM stream). Databases are cached across calls
    so the 2M-capacity measurement doesn't rebuild the 1M one."""
    from dirjax.ops.topk_pallas import quantize_db, rank_topk_fused

    ck = (n_db, dim, int8)
    if ck not in _cache:
        _cache.clear()  # one resident DB at a time (HBM budget)
        scales = None
        if int8 and n_db > 1_000_000:
            # capacity corpora: build int8 chunk-wise so the bf16 source
            # never exists whole (an 8 GB bf16 2M db + its int8 copy
            # exceeds HBM)
            chunk = 262_144
            qs8, ss = [], []
            for j, start in enumerate(range(0, n_db, chunk)):
                rows = min(chunk, n_db - start)
                blk = jax.random.normal(jax.random.PRNGKey(100 + j),
                                        (rows, dim), jnp.bfloat16)
                q8, s8 = quantize_db(blk)
                qs8.append(q8)
                ss.append(s8)
                del blk
            db = jnp.concatenate(qs8, axis=0)
            del qs8
            scales = jnp.concatenate(ss, axis=1)
            _sync(db[:8])
        else:
            db = jax.random.normal(jax.random.PRNGKey(2), (n_db, dim),
                                   jnp.bfloat16)
            if int8:
                db, scales = quantize_db(db)
                _sync(db[:8])
        _cache[ck] = (db, scales)
    db, scales = _cache[ck]
    qs = [jax.random.normal(jax.random.PRNGKey(10 + j), (nq, dim), jnp.bfloat16)
          for j in range(n_iter)]

    def rank(q_):
        vals, idxs = rank_topk_fused(q_, db, k, use_pallas=True,
                                     db_scales=scales,
                                     quantize_queries=int8_queries)
        return vals

    _sync(rank(qs[0]))  # compile + warm
    _sync(rank(qs[1]))
    best = float("inf")
    for _ in range(3):  # best-of-3: reject host scheduling noise
        t0 = time.perf_counter()
        for q_ in qs:
            vals = rank(q_)
        _sync(vals)
        best = min(best, time.perf_counter() - t0)
    return nq / (best / n_iter)


def bench_pq_qps(n_db: int = 1_000_000, m: int = 32, ksub: int = 16,
                 nq: int = 256, k: int = 100, n_iter: int = 6,
                 compute_dtype="bfloat16", _cache={}):
    """ADC (product-quantized) serving throughput: the capacity tier.

    Codes are synthesized uniformly (uint8 codebook ids) — ADC cost is
    independent of code content — and lookup tables come from real
    ``pq_lookup`` calls on random queries/codebooks. Same eager
    back-to-back dispatch pattern as :func:`bench_ranking_qps`. A 16M-row
    index is 512 MB at m=32 — a corpus no dense representation fits on
    one chip (bf16 would need 64 GB)."""
    import jax.numpy as jnp

    from dirjax.ops.pq import pq_lookup, pq_topk

    ck = (n_db, m, ksub)
    if ck not in _cache:
        _cache.clear()
        _cache[ck] = jax.random.randint(
            jax.random.PRNGKey(3), (n_db, m), 0, ksub, jnp.uint8)
    codes = _cache[ck]
    dim = 2048
    dsub = dim // m
    cbs = jax.random.normal(jax.random.PRNGKey(4), (m, ksub, dsub),
                            jnp.float32)
    luts = [pq_lookup(jax.random.normal(jax.random.PRNGKey(20 + j),
                                        (nq, dim), jnp.float32), cbs)
            for j in range(n_iter)]
    dt = None if compute_dtype == "float32" else jnp.bfloat16

    def rank(l_):
        vals, _ = pq_topk(l_, codes, k, compute_dtype=dt)
        return vals

    _sync(rank(luts[0]))  # compile + warm
    _sync(rank(luts[1]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for l_ in luts:
            vals = rank(l_)
        _sync(vals)
        best = min(best, time.perf_counter() - t0)
    return nq / (best / n_iter)


def bench_pq_device_qps(n_db: int = 1_000_000, m: int = 32, ksub: int = 16,
                        nq: int = 256, k: int = 100, n_iter: int = 8):
    """Pure device-time PQ throughput (chained-fori two-point slope): the
    eager metric above is tunnel-dispatch-bound once device time drops
    under the ~3-5 ms per-dispatch cost; this is what a production host
    (no 8 MB/s tunnel) would sustain."""
    import functools

    import jax.numpy as jnp

    from dirjax.ops.pq import _BLOCK, _pq_topk_hier, pq_lookup

    chunk = 131072
    npad = -(-n_db // chunk) * chunk
    codes = jax.random.randint(jax.random.PRNGKey(3), (npad, m), 0, ksub,
                               jnp.uint8)
    dim = 2048
    cbs = jax.random.normal(jax.random.PRNGKey(4), (m, ksub, dim // m),
                            jnp.float32)
    luts = pq_lookup(jax.random.normal(jax.random.PRNGKey(5), (nq, dim),
                                       jnp.float32), cbs)
    # mirror pq_topk's adaptive fine block (8-row blocks past mk=1024
    # keep the phase-C one-hot at ks16 size — PERF_NOTES r5)
    block = 8 if m * ksub > 1024 else _BLOCK
    fn = functools.partial(_pq_topk_hier, n_valid=jnp.int32(n_db), k=k,
                           chunk=chunk, block=block, dt_name="bfloat16",
                           phase_a="pallas", n_static=n_db)
    sec = _timed_loop(lambda l, c: fn(l, c)[0], (luts, codes), n_iter)
    return nq / sec


def bench_ivf_device_qps(n_db_slabs: int = 249_856, nlist: int = 4096,
                         m: int = 32, ksub: int = 16, nq: int = 256,
                         nprobe: int = 32, k: int = 100, n_iter: int = 8):
    """IVF-ADC device-slope throughput: corpus-size-independent serving.

    Builds a synthetic uniform inverted file (ADC cost is independent of
    code content, and uniform cells match what k-means produces on the
    synthetic corpus anyway): ``n_db_slabs`` 64-row slabs over ``nlist``
    cells — the default is ~16M rows in 512 MB of codes, scan fraction
    nprobe/nlist = 1/128. The flat ADC scan's time grows linearly with
    rows; this path's depends only on the probed fraction."""
    import functools

    from dirjax.ops.ivf import _ivf_topk
    from dirjax.ops.pq import pq_lookup

    slab, dim = 64, 2048
    spl = n_db_slabs // nlist               # slabs per cell (uniform)
    nslabs = spl * nlist
    codes = jax.random.randint(jax.random.PRNGKey(3), (nslabs, slab, m),
                               0, ksub, jnp.uint8)
    slab_rows = jnp.arange(nslabs * slab, dtype=jnp.int32) \
        .reshape(nslabs, slab)
    vlist_tab = jnp.arange(nslabs, dtype=jnp.int32).reshape(nlist, spl)
    cv = jax.random.normal(jax.random.PRNGKey(4), (nlist, dim), jnp.float32)
    adj = -0.5 * jnp.sum(cv * cv, axis=1)
    cbs = jax.random.normal(jax.random.PRNGKey(5), (m, ksub, dim // m),
                            jnp.float32)
    q = jax.random.normal(jax.random.PRNGKey(6), (nq, dim), jnp.float32)
    luts = pq_lookup(q, cbs)
    fn = functools.partial(_ivf_topk, k=k, nprobe=nprobe, chunk=128,
                           dt_name="bfloat16")
    sec = _timed_loop(
        lambda l, *a: fn(l, *a)[0],
        (luts, q, cv, adj, vlist_tab, codes, slab_rows), n_iter)
    return nq / sec


def check_binary_exact(n: int = 4096, n_bits: int = 512, nq: int = 8,
                       k: int = 10) -> bool:
    """On-chip exactness gate for the binary tier: BOTH ranking paths'
    VALUES (the popcount scan and the Pallas MXU unpack-matmul kernel)
    must match a brute-force ±1-matmul oracle bitwise, and asym_rescore
    must match a dense rescore of the same shortlist. Runs before the
    binary throughput benches — this toolchain silently miscompiles some
    lane ops (CLAUDE.md), so 'passes on CPU' is not validation for
    ``population_count``/XOR reductions or a new Mosaic kernel."""
    from dirjax.ops.binary import (asym_rescore, bytes_for_search,
                                   hamming_topk, hamming_topk_mxu,
                                   unpack_pm1)

    w = n_bits // 32
    codes = jax.random.bits(jax.random.PRNGKey(0), (n, w), jnp.uint32)
    qc = jax.random.bits(jax.random.PRNGKey(1), (nq, w), jnp.uint32)
    vals, idxs = hamming_topk(qc, codes, k)
    vals, idxs = np.asarray(vals), np.asarray(idxs)
    dbs = unpack_pm1(codes)
    sims = jnp.matmul(unpack_pm1(qc), dbs.T,
                      precision=jax.lax.Precision.HIGHEST)
    ovals, _ = jax.lax.top_k(sims, k)
    if not np.array_equal(vals, np.asarray(ovals)):
        return False
    mvals, _ = hamming_topk_mxu(qc, bytes_for_search(codes), k, n_valid=n)
    if not np.array_equal(np.asarray(mvals), np.asarray(ovals)):
        return False
    vq = jax.random.normal(jax.random.PRNGKey(2), (nq, n_bits), jnp.float32)
    avals, _ = asym_rescore(vq, codes, jnp.asarray(idxs), k)
    dense = np.asarray(jnp.matmul(vq, dbs.T,
                                  precision=jax.lax.Precision.HIGHEST))
    sel = np.take_along_axis(dense, idxs, axis=1)
    want = -np.sort(-sel, axis=1)[:, :k]
    return bool(np.allclose(np.asarray(avals), want, rtol=1e-5, atol=1e-4))


def _binary_codes_cached(n_db: int, w: int, _cache) -> "jnp.ndarray":
    """Resident random byte-layout code corpus, cached per (n_db, w)."""
    ck = (n_db, w)
    if ck not in _cache:
        _cache.clear()
        # byte layout, built chunk-wise: random.bits materializes a 32-bit
        # random per OUTPUT ELEMENT, so a single (16M, 256) uint8 draw
        # transients 16 GB and OOMs the chip (r4 hazard log)
        from dirjax.ops.binary import _to_bytes, bytes_for_search
        chunk = 2_000_000
        parts = [_to_bytes(jax.random.bits(
            jax.random.PRNGKey(100 + j),
            (min(chunk, n_db - s), w), jnp.uint32))
            for j, s in enumerate(range(0, n_db, chunk))]
        _cache[ck] = bytes_for_search(jnp.concatenate(parts))
    return _cache[ck]


_BINARY_CACHE = {}   # one resident code corpus shared by both binary benches


def bench_binary_qps(n_db: int = 1_000_000, n_bits: int = 2048,
                     nq: int = 256, k: int = 100, n_iter: int = 6,
                     asym: bool = False, method: str = "mxu",
                     _cache=_BINARY_CACHE):
    """Binary-hash serving throughput: packed-sign-code Hamming ranking
    (256 B/row at 2048 bits — 8x the int8 corpus per chip). Codes are
    random words (Hamming cost is independent of code content).
    ``method="mxu"`` is the r4 staged path (Pallas unpack-matmul kernel
    phases as separate dispatches); ``"scan"`` is the XLA popcount
    fallback, kept as a labeled comparison metric. ``asym=True`` adds the
    asymmetric float rescore of the Hamming shortlist — the higher-recall
    serving mode. Same eager back-to-back dispatch pattern as
    :func:`bench_ranking_qps`. The SERVING path (what BinaryIndex
    dispatches since r5) is :func:`bench_binary_fused_qps`."""
    from dirjax.ops.binary import (asym_rescore, hamming_topk,
                                   hamming_topk_mxu)

    w = n_bits // 32
    codes = _binary_codes_cached(n_db, w, _cache)
    qcs = [jax.random.bits(jax.random.PRNGKey(10 + j), (nq, w), jnp.uint32)
           for j in range(n_iter)]
    vqs = [jax.random.normal(jax.random.PRNGKey(40 + j), (nq, n_bits),
                             jnp.float32) for j in range(n_iter)]

    def rank(qc_, vq_):
        if method == "mxu":
            vals, idxs = hamming_topk_mxu(qc_, codes, k, n_valid=n_db)
        else:
            vals, idxs = hamming_topk(qc_, codes, k, n_valid=n_db)
        if asym:
            vals, idxs = asym_rescore(vq_, codes, idxs, k)
        return vals

    _sync(rank(qcs[0], vqs[0]))  # compile + warm
    _sync(rank(qcs[1], vqs[1]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for qc_, vq_ in zip(qcs, vqs):
            vals = rank(qc_, vq_)
        _sync(vals)
        best = min(best, time.perf_counter() - t0)
    return nq / (best / n_iter)


def bench_binary_fused_qps(n_db: int = 1_000_000, n_bits: int = 2048,
                           dim: int = 2048, nq: int = 256, k: int = 100,
                           n_iter: int = 6, asym: bool = False,
                           _cache=_BINARY_CACHE):
    """The r5 one-dispatch binary serving path (hamming_search_fused:
    float-query encode -> MXU top-k, ONE jit — what BinaryIndex.search
    dispatches; ``asym=True`` is the EXACT asymmetric ranking, no
    shortlist). Includes the query encoding the staged benches skipped
    (one (nq, dim) x (dim, bits) matmul — ~2 GFLOP at nq=256, trivial
    next to the 1 Tflop corpus scan). Codec projection is random (cost is
    code-content-independent); codes corpus shared with
    :func:`bench_binary_qps`."""
    from dirjax.ops.binary import BinaryCodec, hamming_search_fused

    w = n_bits // 32
    codes = _binary_codes_cached(n_db, w, _cache)
    codec = BinaryCodec(
        mean=jnp.zeros((dim,), jnp.float32),
        proj=jax.random.normal(jax.random.PRNGKey(7), (dim, n_bits),
                               jnp.float32) * 0.03)
    qs = [jax.random.normal(jax.random.PRNGKey(10 + j), (nq, dim),
                            jnp.float32) for j in range(n_iter)]

    def rank(q_):
        vals, _ = hamming_search_fused(q_, codec, codes, k,
                                       n_valid=n_db, asym=asym)
        return vals

    _sync(rank(qs[0]))  # compile + warm
    _sync(rank(qs[1]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for q_ in qs:
            vals = rank(q_)
        _sync(vals)
        best = min(best, time.perf_counter() - t0)
    return nq / (best / n_iter)


def bench_binary_device_ms(n_db: int = 1_000_000, n_bits: int = 2048,
                           nq: int = 256, n_iter: int = 8):
    """Device-slope time of the MXU Hamming kernel's phase 1 (the
    dominant stage: in-VMEM unpack + matmul + fine maxima over the whole
    corpus; phases 2-3 touch only ~k blocks). The production-host ceiling
    once the ~3-5 ms/dispatch tunnel cost is out of the way."""
    from dirjax.ops.binary import (_BITS_TILE, _bits_finemax_phase1,
                                   bytes_for_search)

    w = n_bits // 32
    dbb = bytes_for_search(jax.random.bits(
        jax.random.PRNGKey(2), (n_db, w), jnp.uint32))
    qc = jax.random.bits(jax.random.PRNGKey(3), (nq, w), jnp.uint32)

    # the loop harness adds a float feedback term to the first arg, which
    # uint32 queries can't absorb — xor in a data-dependent bit instead
    def p1(qf, d_):
        q_ = qc ^ qf.astype(jnp.uint32)
        return _bits_finemax_phase1(q_, d_, n_db, _BITS_TILE, False)

    return _timed_loop(p1, (jnp.zeros((nq, w), jnp.float32), dbb),
                       n_iter) * 1e3


def bench_server_qps(kind: str = "pq", n_db: int = 1_000_000,
                     n_clients: int = 16, rows_per_req: int = 16,
                     n_req: int = 96, k: int = 100, pipeline: int = 3,
                     upload_bf16: bool = False, async_clients: int = 0):
    """End-to-end index-server throughput: N client threads, each with
    its own socket, firing ``rows_per_req``-row requests at an
    IndexServer over a Unix socket; the DynamicBatcher coalesces them
    into 256-row device dispatches (``pipeline`` of them in flight at
    once — PERF_NOTES "Index server"). THE number that justifies the
    server's existence: socket-to-socket QPS vs the in-process eager
    number and the device-slope ceiling (PERF_NOTES). On THIS harness
    the floor is tunnel round trips (~60 ms/batch at 4 workers), not
    dirjax. Returns ``(qps, latency_stats_dict)``."""
    import tempfile
    import threading

    from dirjax.server import Client, IndexServer
    from dirjax.serving import PQIndex, RetrievalIndex

    dim = 2048
    if kind == "pq":
        m, ksub = 32, 16
        codes = jax.random.randint(jax.random.PRNGKey(3), (n_db, m), 0,
                                   ksub, jnp.uint8)
        cbs = jax.random.normal(jax.random.PRNGKey(4), (m, ksub, dim // m),
                                jnp.float32)
        index = PQIndex.from_codes(cbs, codes, compute_dtype=jnp.bfloat16)
    else:
        db = jax.random.normal(jax.random.PRNGKey(2), (n_db, dim),
                               jnp.bfloat16)
        index = RetrievalIndex(db, dtype=jnp.bfloat16)

    path = tempfile.mktemp(prefix="dirjax-bench-", suffix=".sock")
    server = IndexServer(index, path, max_batch=256, max_wait_ms=4.0,
                         pipeline=pipeline, upload_bf16=upload_bf16)
    st = threading.Thread(target=server.serve_forever, daemon=True)
    st.start()

    rng = np.random.default_rng(0)
    queries = rng.standard_normal((rows_per_req, dim), np.float32)
    # pre-compile EVERY bucket the batcher can emit, then clear the
    # latency window: unwarmed buckets compiling mid-run sank this bench
    # from 6.6k to 0.9k QPS with p99 8.8 s (see DynamicBatcher.warmup)
    server.batcher.warmup(k=k)
    warm = Client(path)
    warm.search(queries, k=k)
    server.batcher.reset_latency_stats()

    if async_clients:
        # N pipelined connections, each keeping a 32-deep window of async
        # requests in flight (Client.search_async) — the profile of N
        # production RPC shims sharing one server. N=1 is the r4 point;
        # the N sweep locates the tunnel-saturation knee (VERDICT r4 #6).
        window = 32
        per_client = max(window, (n_req * 16) // async_clients)
        start = threading.Barrier(async_clients + 1)
        done = []

        def aclient():
            c = Client(path)
            start.wait()
            futs = []
            for _ in range(per_client):
                futs.append(c.search_async(queries, k=k))
                if len(futs) >= window:
                    futs.pop(0).result()
            for f in futs:
                f.result()
            done.append(time.perf_counter())
            c.close()

        threads = [threading.Thread(target=aclient, daemon=True)
                   for _ in range(async_clients)]
        for t in threads:
            t.start()
        start.wait()
        t0 = time.perf_counter()
        for t in threads:
            t.join()
        elapsed = max(done) - t0
        lat = server.batcher.latency_stats()
        warm.shutdown_server()
        st.join(timeout=10)
        return async_clients * per_client * rows_per_req / elapsed, lat

    start = threading.Barrier(n_clients + 1)
    done = []

    def client_loop():
        c = Client(path)
        start.wait()
        for _ in range(n_req):
            c.search(queries, k=k)
        done.append(time.perf_counter())
        c.close()

    threads = [threading.Thread(target=client_loop, daemon=True)
               for _ in range(n_clients)]
    for t in threads:
        t.start()
    start.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    elapsed = max(done) - t0
    lat = server.batcher.latency_stats()
    warm.shutdown_server()
    st.join(timeout=10)
    qps = n_clients * n_req * rows_per_req / elapsed
    return qps, lat


V5E_PEAK_BF16_FLOPS = 197e12   # one v5e chip, bf16 MXU peak


def bench_train_step(n_iter: int = 8, batch: int = 16, size: int = 224,
                     microbatch: int = 0, with_mfu: bool = False):
    """Fine-tuning throughput: listwise-AP train steps (R101-GeM, Adam,
    bf16 compute — the BASELINE configs[4] recipe shape). The reference
    ships no trainer at all; this pins the dirjax trainer's device cost
    in the artifact.

    ``microbatch>0`` measures the two-pass memory-bounded step (exact
    listwise grads at O(microbatch) activations — the path a realistic
    large-crop fine-tune uses). ``with_mfu=True`` additionally returns
    the XLA cost-analysis FLOPs of one compiled step and the implied
    model-FLOPs utilization against the v5e bf16 peak — the honest
    hardware count (it includes the two-pass recompute).

    Unlike ``_timed_loop`` this compiles ONE loop with a *dynamic* trip
    count (``lax.fori_loop`` with a traced bound lowers to while_loop):
    the R101 fwd+bwd+Adam graph is by far the largest in this file and
    compiling it twice for two static trip counts doubles a multi-minute
    tunnel compile for no measurement benefit. Consecutive steps thread
    real (params, opt_state) — the actual training dependence chain — so
    XLA cannot overlap or elide iterations."""
    import optax

    from dirjax.models import create_model
    from dirjax.train import TrainConfig, make_train_step

    cfg = TrainConfig(batch_size=batch, image_size=size, loss="ap",
                      microbatch=microbatch)
    model = create_model(cfg.arch)
    params = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(cfg.learning_rate)
    opt_state = tx.init(params)
    if microbatch:
        from dirjax.train import make_two_pass_train_step

        step = make_two_pass_train_step(model, cfg, tx, dtype=jnp.bfloat16)
    else:
        step = make_train_step(model, cfg, tx, dtype=jnp.bfloat16)
    images = jax.random.normal(jax.random.PRNGKey(1),
                               (batch, size, size, 3), jnp.float32)
    labels = jnp.asarray(np.repeat(np.arange(batch // 4), 4))

    @jax.jit
    def loop(p, o, imgs, labs, n):
        # imgs/labs as ARGUMENTS, not closure constants — closures bake
        # arrays into the remote compile request body (CLAUDE.md)
        def body(_, carry):
            p_, o_ = carry
            p_, o_, _ = step(p_, o_, imgs, labs)
            return (p_, o_)

        p, o = jax.lax.fori_loop(0, n, body, (p, o))
        return jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b).astype(jnp.float32), p, 0.0)

    n_lo, n_hi = max(1, n_iter // 4), n_iter
    _sync(loop(params, opt_state, images, labels, n_lo))   # compile + warm

    def best_of(n, reps=2):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _sync(loop(params, opt_state, images, labels, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = best_of(n_lo), best_of(n_hi)
    sec = (t_hi - t_lo) / (n_hi - n_lo)
    if not with_mfu:
        return batch / sec
    try:
        # AOT cost analysis of ONE compiled step (the loop above has a
        # dynamic trip count, which cost analysis can't integrate over)
        comp = jax.jit(step).lower(params, opt_state, images,
                                   labels).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca["flops"])
        if microbatch:
            # XLA cost analysis counts a scan/map BODY once, not times
            # its trip count, so the two-pass step's per-microbatch
            # fwd and vjp passes under-report by batch/microbatch.
            # Verified on-chip (r4): mb8 reported 2579 GF/step and mb16
            # 5158 GF for the identical (b32, 512^2) job, both scaling
            # to the same 10.3 TF real step = 4/3 x the whole-batch
            # step's true-counted 242 GF/img — exactly the two-pass
            # recompute factor. The non-scanned tail (loss grad, Adam)
            # is <1% of step flops, so scaling everything is fine.
            flops *= batch / microbatch
    except Exception:
        flops = float("nan")
    return {"img_per_sec": batch / sec,
            "step_ms": sec * 1e3,
            "gflops_per_step": flops / 1e9,
            "mfu": (flops / sec) / V5E_PEAK_BF16_FLOPS}


def bench_head_ms(n_iter: int = 20, reps: int = 2):
    """Fused GeM-head kernel time. Returns ``reps`` independent slope
    measurements: the number flapped 0.289 (r3) -> 0.644 (r4) ms across
    rounds with UNCHANGED kernel source, so the artifact now records the
    spread (and main() measures at two different points of the bench run
    to expose chip-state dependence) instead of a single point."""
    from dirjax.ops.gem_head import fused_gem_head

    B, H, W, C, D = 8, 32, 44, 2048, 2048
    x = jax.random.uniform(jax.random.PRNGKey(4), (B, H, W, C), jnp.float32)
    wgt = jax.random.normal(jax.random.PRNGKey(5), (C, D), jnp.float32) * 0.02
    bias = jnp.zeros((D,), jnp.float32)

    def head(x_, w_, b_):
        return fused_gem_head(x_, 3.0, w_, b_, use_pallas=True)

    return [_timed_loop(head, (x, wgt, bias), n_iter) * 1e3
            for _ in range(reps)]


def main():
    extras = {}
    t_start = time.time()

    r101 = bench_descriptor_throughput("resnet101_rmac", batch=4, hw=(1024, 768))
    extras["r101_1024x768_bf16_img_per_sec"] = round(r101, 2)

    try:
        r50 = bench_descriptor_throughput("resnet50_rmac", batch=4, hw=(1024, 768))
        extras["r50_1024x768_bf16_img_per_sec"] = round(r50, 2)
    except Exception as e:  # keep the primary metric even if extras fail
        extras["r50_error"] = str(e)[:120]

    try:
        extras["r101_bucket_masked_img_per_sec"] = round(
            bench_descriptor_throughput("resnet101_rmac", batch=4,
                                        hw=(1024, 768), masked=True), 2)
    except Exception as e:
        extras["masked_error"] = str(e)[:120]

    head_samples = []
    try:
        # first head sample EARLY (only descriptor benches ran so far) —
        # the late sample at the end of main() exposes chip-state drift
        head_samples += bench_head_ms()
    except Exception as e:
        extras["head_error"] = str(e)[:120]

    try:
        qps = bench_ranking_qps()
        extras["ranking_qps_1M_topk100"] = round(qps, 1)
        extras["ranking_qps_1M_topk10"] = round(bench_ranking_qps(k=10), 1)
        # 256-query batches amortize the HBM stream over more MXU work
        extras["ranking_qps_1M_topk100_nq256"] = round(
            bench_ranking_qps(nq=256, n_iter=6), 1)
        # int8-quantized database: half the stream, 2x corpus per chip
        extras["ranking_qps_1M_topk100_int8"] = round(
            bench_ranking_qps(int8=True), 1)
        extras["ranking_qps_1M_topk100_int8_nq256"] = round(
            bench_ranking_qps(int8=True, nq=256, n_iter=6), 1)
        # full-int8 (queries quantized too): the int8-MXU serving mode
        extras["ranking_qps_1M_topk100_int8w8q_nq256"] = round(
            bench_ranking_qps(int8=True, int8_queries=True, nq=256,
                              n_iter=6), 1)
    except Exception as e:
        extras["ranking_error"] = str(e)[:120]

    try:
        # capacity demo: a 2M x 2048 int8 corpus resident on ONE chip
        # (bf16 could not hold it at all) — every advertised number lives
        # in this artifact. Separate try: an OOM here must not poison the
        # remaining benches
        extras["ranking_qps_2M_topk100_int8"] = round(
            bench_ranking_qps(n_db=2_000_000, int8=True, n_iter=6), 1)
    except Exception as e:
        extras["ranking_2M_error"] = str(e)[:120]
    finally:
        # release the capacity corpus before the head bench
        bench_ranking_qps.__defaults__[-1].clear()  # the _cache dict

    try:
        # product-quantized (ADC) serving: the capacity tier — 32 B/row
        extras["pq_qps_1M_m32k16_bf16_nq256"] = round(bench_pq_qps(), 1)
        extras["pq_qps_1M_m32k16_fp32_nq256"] = round(
            bench_pq_qps(compute_dtype="float32"), 1)
        # 16M rows resident on ONE chip (512 MB of codes; dense bf16
        # would need 64 GB)
        extras["pq_qps_16M_m32k16_bf16_nq256"] = round(
            bench_pq_qps(n_db=16_000_000), 1)
        # the 8-bit ADC the recall study recommends on concentrated
        # spectra (RECALL_r05 trained: R@10 0.65 vs 0.45 for ks16 at the
        # same 32 B/row); mk=8192 exceeds the Pallas one-hot VMEM gate,
        # so this measures the XLA scan path
        extras["pq_qps_1M_m32k256_bf16_nq256"] = round(
            bench_pq_qps(ksub=256), 1)
    except Exception as e:
        extras["pq_error"] = str(e)[:120]
    finally:
        bench_pq_qps.__defaults__[-1].clear()

    try:
        extras["pq_qps_device_1M_m32k16_bf16_nq256"] = round(
            bench_pq_device_qps(), 1)
    except Exception as e:
        extras["pq_device_error"] = str(e)[:120]

    try:
        # IVF-ADC: probe 32/4096 cells of a 16M-row inverted file —
        # latency set by the scan fraction, not the corpus size (the
        # flat-scan pq_qps_16M number above is the comparison)
        extras["ivf_qps_device_16M_nprobe32_nq256"] = round(
            bench_ivf_device_qps(), 1)
        extras["ivf_qps_device_16M_nprobe32_nq16"] = round(
            bench_ivf_device_qps(nq=16), 1)
        extras["ivf_qps_device_16M_nprobe8_nq256"] = round(
            bench_ivf_device_qps(nprobe=8), 1)
    except Exception as e:
        extras["ivf_error"] = str(e)[:120]

    try:
        # capacity: ~100M rows (3 GB of codes + 0.4 GB row ids) resident
        # and served on ONE chip — 50x the int8 ceiling, 6x the flat-PQ
        # 16M demo; a dense bf16 corpus this size would need 400 GB
        extras["ivf_qps_device_100M_nprobe32_nq256"] = round(
            bench_ivf_device_qps(n_db_slabs=1_556_480, nlist=16384,
                                 n_iter=6), 1)
    except Exception as e:
        extras["ivf_100M_error"] = str(e)[:120]

    try:
        # binary-hash tier: exactness gate FIRST (population_count/XOR
        # reductions and the Mosaic unpack-matmul kernel must both match
        # the oracle on real TPU), then QPS on the MXU serving path
        ok = check_binary_exact()
        extras["binary_exact_vs_oracle"] = bool(ok)
        if ok:
            # the ONE-dispatch serving path (r5 fusion — what
            # BinaryIndex.search runs; includes query encoding)
            extras["binary_fused_qps_1M_2048b_nq256"] = round(
                bench_binary_fused_qps(), 1)
            extras["binary_fused_asym_qps_1M_2048b_nq256"] = round(
                bench_binary_fused_qps(asym=True), 1)
            extras["binary_fused_qps_1M_2048b_nq64"] = round(
                bench_binary_fused_qps(nq=64), 1)
            # the r4 staged dispatches, for the fusion-delta record
            extras["binary_qps_1M_2048b_nq256"] = round(
                bench_binary_qps(), 1)
            extras["binary_asym_qps_1M_2048b_nq256"] = round(
                bench_binary_qps(asym=True), 1)
            # the XLA popcount fallback, for the record (the MXU kernel's
            # win over it is the r4 headline — PERF_NOTES binary section)
            extras["binary_scan_qps_1M_2048b_nq256"] = round(
                bench_binary_qps(method="scan"), 1)
            # capacity: 16M rows in 4 GB of codes (8x the int8 ceiling)
            extras["binary_fused_qps_16M_2048b_nq256"] = round(
                bench_binary_fused_qps(n_db=16_000_000, n_iter=4), 1)
    except Exception as e:
        extras["binary_error"] = str(e)[:120]
    finally:
        _BINARY_CACHE.clear()

    try:
        extras["binary_p1_ms_device_1M_2048b_nq256"] = round(
            bench_binary_device_ms(), 2)
    except Exception as e:
        extras["binary_device_error"] = str(e)[:120]

    try:
        # socket-to-socket serving: 16 client threads x 16-row requests
        # coalesced by the DynamicBatcher into 256-row device dispatches,
        # 3 batches in flight (pipeline) vs the serial batcher baseline
        qps, lat = bench_server_qps(kind="pq")
        extras["server_qps_pq_1M_16cl_16rows"] = round(qps, 1)
        for p in ("p50_ms", "p99_ms"):
            if p in lat:
                extras[f"server_pq_{p}"] = round(lat[p], 2)
        qps, _ = bench_server_qps(kind="pq", n_req=48, pipeline=1)
        extras["server_qps_pq_1M_16cl_16rows_serial"] = round(qps, 1)
        # host-side bf16 conversion: halves the upload-bandwidth term
        qps, _ = bench_server_qps(kind="pq", n_req=48, upload_bf16=True)
        extras["server_qps_pq_1M_16cl_16rows_bf16up"] = round(qps, 1)
        # N pipelined connections, 32 async requests in flight each
        # (Client.search_async): N=1 is the single-client ceiling; the
        # sweep locates the tunnel-saturation knee (r5)
        for nac in (1, 2, 4, 8):
            qps, _ = bench_server_qps(kind="pq", n_req=48,
                                      upload_bf16=True, async_clients=nac)
            extras[f"server_qps_pq_1M_{nac}cl_async32_bf16up"] = \
                round(qps, 1)
    except Exception as e:
        extras["server_pq_error"] = str(e)[:120]

    try:
        qps, lat = bench_server_qps(kind="bf16", n_req=48)
        extras["server_qps_bf16_1M_16cl_16rows"] = round(qps, 1)
        for p in ("p50_ms", "p99_ms"):
            if p in lat:
                extras[f"server_bf16_{p}"] = round(lat[p], 2)
    except Exception as e:
        extras["server_bf16_error"] = str(e)[:120]

    try:
        head_samples += bench_head_ms()   # LATE sample, post serving-benches
        extras["fused_head_ms"] = round(float(np.median(head_samples)), 3)
        extras["fused_head_ms_spread"] = [round(float(v), 3)
                                          for v in head_samples]
    except Exception as e:
        extras["head_error"] = str(e)[:120]
        if head_samples:
            extras["fused_head_ms"] = round(float(np.median(head_samples)),
                                            3)

    try:
        tr = bench_train_step(with_mfu=True)
        extras["train_img_per_sec_r101_224_ap_bf16"] = round(
            tr["img_per_sec"], 2)
        extras["train_mfu_r101_224_b16"] = round(tr["mfu"], 3)
    except Exception as e:
        extras["train_error"] = str(e)[:120]

    try:
        # realistic fine-tune shape: 512^2 crops, batch 32, two-pass
        # microbatch 8 (the memory-bounded path a large-crop AP recipe
        # actually runs)
        tr = bench_train_step(n_iter=4, batch=32, size=512, microbatch=8,
                              with_mfu=True)
        extras["train_img_per_sec_r101_512_b32_mb8_ap_bf16"] = round(
            tr["img_per_sec"], 2)
        extras["train_mfu_r101_512_b32_mb8"] = round(tr["mfu"], 3)
    except Exception as e:
        extras["train_512_error"] = str(e)[:120]

    extras["bench_wallclock_s"] = round(time.time() - t_start, 1)
    extras["backend"] = jax.default_backend()

    result = {
        "metric": "descriptor_images_per_sec_r101_1024x768_bf16_1chip",
        "value": round(r101, 2),
        "unit": "img/s",
        "vs_baseline": round(r101 / PER_CHIP_TARGET, 3),
        **extras,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
