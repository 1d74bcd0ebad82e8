"""Phase-cost experiments for the IVF candidate pipeline at 16M rows."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dirjax.ops.pq import _adc_modes, _select_exact, pq_lookup
from bench import _timed_loop

nlist, spl, slab, m, ksub, dim = 4096, 61, 64, 32, 16, 2048
nslabs = nlist * spl
key = jax.random.PRNGKey(0)
codes = jax.random.randint(key, (nslabs, slab, m), 0, ksub, jnp.uint8)
slab_rows = jnp.arange(nslabs * slab, dtype=jnp.int32).reshape(nslabs, slab)
vlist_tab = jnp.arange(nslabs, dtype=jnp.int32).reshape(nlist, spl)
cv = jax.random.normal(jax.random.PRNGKey(1), (nlist, dim), jnp.float32)
adj = -0.5 * jnp.sum(cv * cv, axis=1)
cbs = jax.random.normal(jax.random.PRNGKey(2), (m, ksub, dim // m),
                        jnp.float32)
nq, nprobe, chunk = 256, 32, 128
q = jax.random.normal(jax.random.PRNGKey(3), (nq, dim), jnp.float32)
luts = pq_lookup(q, cbs)
codes_flat = codes.reshape(nslabs, slab * m)


def probe_cands(luts_, q_):
    cs = jnp.matmul(q_, cv.T, precision=jax.lax.Precision.HIGHEST)
    _, pid = jax.lax.top_k(cs + adj[None, :], nprobe)
    bias = _select_exact(cs, pid)
    cand = jnp.take(vlist_tab, pid, axis=0).reshape(nq, nprobe * spl)
    bias_s = jnp.repeat(bias, spl, axis=1)
    return cand, bias_s


def probe_only(luts_, q_):
    cand, bias_s = probe_cands(luts_, q_)
    return jnp.sum(cand.astype(jnp.float32)) + jnp.sum(bias_s)


def make_scan(body_fn):
    def run(luts_, q_):
        cand, bias_s = probe_cands(luts_, q_)
        s_total = cand.shape[1]
        pad = (-s_total) % chunk
        if pad:
            cand = jnp.pad(cand, ((0, 0), (0, pad)), constant_values=-1)
            bias_s = jnp.pad(bias_s, ((0, 0), (0, pad)))
        nch = cand.shape[1] // chunk
        safe = jnp.maximum(cand, 0)
        to_chunks = lambda a: jnp.moveaxis(a.reshape(nq, nch, chunk), 1, 0)
        _, fmax = jax.lax.scan(
            body_fn, 0, (to_chunks(safe), to_chunks(bias_s),
                         to_chunks(cand)))
        return jnp.sum(jnp.moveaxis(fmax, 0, 1))
    return run


def body_gather_only(_, xs):
    ids, b, raw = xs
    blk = jnp.take(codes_flat, ids.reshape(-1), axis=0) \
        .reshape(nq, chunk, slab, m)
    rows = jnp.take(slab_rows, ids.reshape(-1), axis=0) \
        .reshape(nq, chunk, slab)
    return 0, (jnp.sum(blk.astype(jnp.float32), axis=(2, 3))
               + jnp.sum(rows.astype(jnp.float32), axis=2) + b)


def body_5d(_, xs):
    ids, b, raw = xs
    blk = jnp.take(codes_flat, ids.reshape(-1), axis=0) \
        .reshape(nq, chunk, slab, m)
    rows = jnp.take(slab_rows, ids.reshape(-1), axis=0) \
        .reshape(nq, chunk, slab)
    dt, prec = _adc_modes(jnp.bfloat16)
    oh = jax.nn.one_hot(blk.astype(jnp.int32), ksub, dtype=dt)
    adc = jnp.einsum("qcsmk,qmk->qcs", oh, luts.astype(dt),
                     precision=prec, preferred_element_type=jnp.float32)
    ok = (rows >= 0) & (raw >= 0)[:, :, None]
    s = jnp.where(ok, b[:, :, None] + adc, -jnp.inf)
    return 0, s.max(axis=2)


def body_4d(_, xs):
    ids, b, raw = xs
    blk = jnp.take(codes_flat, ids.reshape(-1), axis=0) \
        .reshape(nq, chunk * slab, m)
    rows = jnp.take(slab_rows, ids.reshape(-1), axis=0) \
        .reshape(nq, chunk, slab)
    dt, prec = _adc_modes(jnp.bfloat16)
    oh = jax.nn.one_hot(blk.astype(jnp.int32), ksub, dtype=dt)
    adc = jnp.einsum("qcmk,qmk->qc", oh, luts.astype(dt),
                     precision=prec, preferred_element_type=jnp.float32) \
        .reshape(nq, chunk, slab)
    ok = (rows >= 0) & (raw >= 0)[:, :, None]
    s = jnp.where(ok, b[:, :, None] + adc, -jnp.inf)
    return 0, s.max(axis=2)


for name, fn in (("probe-only", probe_only),
                 ("gather-only", make_scan(body_gather_only)),
                 ("full-5d", make_scan(body_5d)),
                 ("full-4d", make_scan(body_4d))):
    sec = _timed_loop(fn, (luts, q), 6)
    print(f"{name:12s} {sec * 1e3:7.2f} ms/batch")
