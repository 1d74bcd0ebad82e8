"""Real IVF build at 1M rows: build cost + recall-vs-nprobe on TPU."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dirjax.ops.ivf import build_ivf, ivf_topk
from dirjax.ops.pq import pq_lookup, pq_topk, train_pq, encode_pq

n, d, ncent = 1_000_000, 256, 4096
rng = np.random.default_rng(0)
centers = rng.standard_normal((ncent, d)).astype(np.float32)
centers /= np.linalg.norm(centers, axis=1, keepdims=True)

# generate on device in chunks (host RNG for cluster ids only)
pick = rng.integers(0, ncent, n)
chunks = []
cj = jnp.asarray(centers)
for s in range(0, n, 131072):
    ids = jnp.asarray(pick[s: s + 131072])
    noise = 0.25 * jax.random.normal(jax.random.PRNGKey(s),
                                     (len(ids), d), jnp.float32)
    blk = jnp.take(cj, ids, axis=0) + noise
    blk = blk / jnp.linalg.norm(blk, axis=1, keepdims=True)
    chunks.append(blk)
x = jnp.concatenate(chunks)
del chunks
print("corpus built", x.shape, flush=True)

t0 = time.time()
ivf, centroids, codebooks = build_ivf(
    x, nlist=1024, m=32, ksub=16, coarse_iters=10, pq_iters=15,
    sample=262144)
print(f"build_ivf: {time.time() - t0:.1f}s  nvlist={ivf.nvlist} "
      f"cap={ivf.vlist_tab.shape[1]} nslabs={ivf.codes.shape[0]}",
      flush=True)

# flat PQ baseline on the same data (no residuals)
t0 = time.time()
flat_cb = train_pq(x, m=32, ksub=16, iters=15, sample=262144)
flat_codes = encode_pq(x, flat_cb)
print(f"flat pq build: {time.time() - t0:.1f}s", flush=True)

# queries: perturbed db rows; ground truth = exact dot top-10
nq, k = 256, 10
qi = rng.integers(0, n, nq)
q = np.asarray(jnp.take(x, jnp.asarray(qi), axis=0)) \
    + 0.05 * rng.standard_normal((nq, d)).astype(np.float32)
q /= np.linalg.norm(q, axis=1, keepdims=True)
qj = jnp.asarray(q)
# exact ground truth in chunks
best_v = None
for s in range(0, n, 262144):
    sc = jnp.matmul(qj, x[s: s + 262144].T,
                    precision=jax.lax.Precision.HIGHEST)
    v, i = jax.lax.top_k(sc, k)
    i = i + s
    if best_v is None:
        best_v, best_i = v, i
    else:
        cv = jnp.concatenate([best_v, v], axis=1)
        ci = jnp.concatenate([best_i, i], axis=1)
        best_v, p = jax.lax.top_k(cv, k)
        best_i = jnp.take_along_axis(ci, p, axis=1)
exact = np.asarray(best_i)
print("exact gt done", flush=True)


def recall(idxs):
    return float(np.mean([
        len(set(a.tolist()) & set(b.tolist())) / k
        for a, b in zip(np.asarray(idxs), exact)]))


_, fi = pq_topk(pq_lookup(qj, flat_cb), flat_codes, k,
                compute_dtype=jnp.bfloat16)
print(f"flat PQ ADC recall@10: {recall(fi):.3f}", flush=True)

luts = pq_lookup(qj, codebooks)
for nprobe in (4, 16, 64, 256, ivf.nvlist):
    t0 = time.time()
    _, ii = ivf_topk(luts, qj, ivf, k, nprobe=nprobe,
                     compute_dtype=jnp.bfloat16)
    r = recall(ii)
    print(f"ivf nprobe={nprobe:5d}: recall@10 {r:.3f} "
          f"(wall {time.time() - t0:.1f}s incl compile)", flush=True)

# shortlist recovery: does the ADC top-40 contain the exact top-10?
for nprobe in (16, 64):
    _, i40 = ivf_topk(luts, qj, ivf, 40, nprobe=nprobe,
                      compute_dtype=jnp.bfloat16)
    r = float(np.mean([
        len(set(a.tolist()) & set(b.tolist())) / k
        for a, b in zip(np.asarray(i40), exact)]))
    print(f"ivf nprobe={nprobe}: exact@10 within ADC top-40: {r:.3f}",
          flush=True)
