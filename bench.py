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
* host<->device transfers ride a slow tunnel (~8 MB/s) — all benchmark data
  is generated on device;
* a device round-trip costs ~30 ms — timing runs N iterations inside one
  jitted fori_loop with a data dependence between iterations so XLA cannot
  collapse them, and divides by N;
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
    fn = functools.partial(_pq_topk_hier, n_valid=jnp.int32(n_db), k=k,
                           chunk=chunk, block=_BLOCK, dt_name="bfloat16",
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


def bench_train_step(n_iter: int = 8, batch: int = 16, size: int = 224):
    """Fine-tuning throughput: listwise-AP train steps (R101-GeM, Adam,
    bf16 compute — the BASELINE configs[4] recipe shape). The reference
    ships no trainer at all; this pins the dirjax trainer's device cost
    in the artifact.

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

    cfg = TrainConfig(batch_size=batch, image_size=size, loss="ap")
    model = create_model(cfg.arch)
    params = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(cfg.learning_rate)
    opt_state = tx.init(params)
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
    return batch / sec


def bench_head_ms(n_iter: int = 20):
    from dirjax.ops.gem_head import fused_gem_head

    B, H, W, C, D = 8, 32, 44, 2048, 2048
    x = jax.random.uniform(jax.random.PRNGKey(4), (B, H, W, C), jnp.float32)
    wgt = jax.random.normal(jax.random.PRNGKey(5), (C, D), jnp.float32) * 0.02
    bias = jnp.zeros((D,), jnp.float32)

    def head(x_, w_, b_):
        return fused_gem_head(x_, 3.0, w_, b_, use_pallas=True)

    return _timed_loop(head, (x, wgt, bias), n_iter) * 1e3


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
        extras["fused_head_ms"] = round(bench_head_ms(), 3)
    except Exception as e:
        extras["head_error"] = str(e)[:120]

    try:
        extras["train_img_per_sec_r101_224_ap_bf16"] = round(
            bench_train_step(), 2)
    except Exception as e:
        extras["train_error"] = str(e)[:120]

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
