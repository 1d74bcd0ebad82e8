"""Realistic recall study for the compressed serving tiers (r4 + r5).

The compressed tiers (int8 / PQ / OPQ / IVF-PQ / binary-ITQ) had their
recall measured only on a brutal synthetic (PERF_NOTES IVF section). This
study grades them on descriptors with a REALISTIC spectrum: an actual
GeM descriptor head run over generated structured images, PCA-whitened
(whitenp=0.5) and L2-normalized — the exact serving pipeline
(``/root/reference/dirtorch/test_dir.py`` applies the same whiten+norm
before ranking). Offline-feasible by construction: no dataset, no egress.

Stage 0 (TPU, r5) — ``python recall_study.py train``:
    fine-tune a descriptor model with the repo's own trainer (listwise AP
    loss, ``dirjax.train.make_train_step``) on a CLUSTERED synthetic
    corpus generated on device (each class = one base scene, each example
    a random jittered view of it), and save a native checkpoint. A
    trained backbone concentrates descriptor variance far faster than a
    random-init one — the r4 study's spectrum was the flat worst case,
    and the serving-tier guidance depends on which regime holds
    (VERDICT r4 #1).

Stage 1 (TPU or CPU) — ``python recall_study.py extract``:
    generate ``--n-db`` structured images (random gradient background +
    gaussian blobs + sinusoidal texture), plus ``--n-q`` query views
    (random crop/photometric jitter of db images, so every query has
    a true near-duplicate among many same-statistics distractors), run
    the descriptor head (random-init by default; ``--checkpoint`` loads
    a stage-0 fine-tune), save raw descriptors.

Stage 2 (CPU) — ``python recall_study.py evaluate``:
    PCA-whiten, report the variance spectrum (top-k shares), build every
    serving tier on the whitened descriptors, measure recall@k vs the
    exact dot-product ranking, sweep each tier's knobs, validate
    ``dirjax.tuning.tune`` recommendations on HELD-OUT queries, and write
    the JSON artifact (``--section`` nests the results, so one file can
    carry the flat-spectrum and trained-spectrum studies side by side).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

import numpy as np

DESC_FILE = "recall_descs.npz"
OUT_FILE = "RECALL_r05.json"


# --------------------------------------------------------------------------
# stage 0: on-chip fine-tune for a trained (concentrated) spectrum
# --------------------------------------------------------------------------

def train(args):
    import time

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    from dirjax.models import create_model
    from dirjax.train import TrainConfig, make_train_step
    from dirjax.utils.checkpoints import Checkpoint, save_native

    assert args.batch % args.views == 0, "--views must divide --batch"
    cpb = args.batch // args.views      # classes per batch
    h = w = args.size
    # deliberately the EXACT bench_train_step configuration (same arch /
    # batch / plain optax.adam / bf16 / make_train_step): its compiled
    # step is already in the persistent compilation cache from the bench
    # runs — a bespoke optimizer graph here costs a multi-minute (worst
    # case: much longer) remote compile for zero study value
    cfg = TrainConfig(arch=args.arch, loss="ap", batch_size=args.batch,
                      image_size=args.size, learning_rate=args.lr, seed=0)
    model = create_model(cfg.arch)
    t0 = time.time()
    params = model.init(jax.random.PRNGKey(cfg.seed))
    tx = optax.adam(cfg.learning_rate)
    opt_state = tx.init(params)
    step = make_train_step(model, cfg, tx, dtype=jnp.bfloat16)
    class_key = jax.random.PRNGKey(777)   # class identity: scene per class

    @jax.jit
    def make_batch(key, cls_ids):
        # class c's base scene is DETERMINISTIC (fold_in by class id), so
        # the same class re-appears across steps; each example is an
        # independent jittered view — the Siamese multi-crop recipe with
        # the corpus generated on device (no loader, no host bytes).
        # Kept a SEPARATE jit from the train step so the step program
        # stays byte-identical to the bench's cached one.
        scenes = jax.vmap(
            lambda c: _scene_batch(jax.random.fold_in(class_key, c),
                                   1, h, w)[0])(cls_ids)
        reps = jnp.repeat(scenes, args.views, axis=0)
        return _query_views(key, reps)

    losses = []
    for it in range(args.steps):
        key = jax.random.PRNGKey(10_000 + it)
        cls_np = np.random.default_rng(it).integers(0, args.n_classes,
                                                    size=cpb)
        imgs = make_batch(key, jnp.asarray(cls_np, jnp.int32))
        labels = jnp.asarray(np.repeat(cls_np, args.views))
        params, opt_state, loss = step(params, opt_state, imgs, labels)
        losses.append(float(loss))
        if it == 0:
            print(f"first step done (compiles: {time.time()-t0:.0f}s)",
                  flush=True)
        if (it + 1) % 25 == 0:
            recent = sum(losses[-25:]) / len(losses[-25:])
            print(f"step {it + 1}/{args.steps} ap-loss {recent:.4f}",
                  flush=True)
    ckpt = Checkpoint(model=model, params=params,
                      preprocess=model.preprocess,
                      extra={"steps": args.steps,
                             "n_classes": args.n_classes,
                             "loss_first25": round(
                                 sum(losses[:25]) / min(25, len(losses)), 4),
                             "loss_last25": round(
                                 sum(losses[-25:]) / min(25, len(losses)), 4)})
    save_native(args.out, ckpt)
    print(f"saved {cfg.arch} fine-tune ({args.steps} steps, AP loss "
          f"{ckpt.extra['loss_first25']} -> {ckpt.extra['loss_last25']}) "
          f"-> {args.out}", flush=True)


# --------------------------------------------------------------------------
# stage 1: image synthesis + descriptor extraction
# --------------------------------------------------------------------------

def _scene_batch(key, n, h, w):
    """Structured random scenes on device: low-frequency color gradient +
    8 random gaussian blobs + oriented sinusoid + pixel noise."""
    import jax
    import jax.numpy as jnp

    ks = jax.random.split(key, 8)
    yy = jnp.linspace(0.0, 1.0, h)[None, :, None, None]
    xx = jnp.linspace(0.0, 1.0, w)[None, None, :, None]
    # gradient background: c0 + c1*y + c2*x per channel
    g = jax.random.uniform(ks[0], (n, 1, 1, 3, 3))
    img = g[..., 0] + g[..., 1] * yy + g[..., 2] * xx
    # gaussian blobs
    nb = 8
    bc = jax.random.uniform(ks[1], (n, nb, 2))            # centers (y, x)
    bs = jax.random.uniform(ks[2], (n, nb, 1), minval=0.02, maxval=0.15)
    bcol = jax.random.uniform(ks[3], (n, nb, 3), minval=-0.8, maxval=0.8)
    d2 = ((yy[..., 0][..., None] - bc[:, None, None, :, 0]) ** 2
          + (xx[..., 0][..., None] - bc[:, None, None, :, 1]) ** 2)
    blob = jnp.exp(-d2 / (2 * bs[:, None, None, :, 0] ** 2))
    img = img + jnp.einsum("nhwb,nbc->nhwc", blob, bcol)
    # oriented sinusoid texture
    # distinct keys per draw: reusing one key for two same-shape draws
    # returns IDENTICAL uniforms (r4 review: th/fr were perfectly
    # correlated and ph shared bits with the pixel noise — one fewer
    # independent factor of scene variation than intended)
    th = jax.random.uniform(ks[4], (n, 1, 1, 1), maxval=np.pi)
    fr = jax.random.uniform(ks[6], (n, 1, 1, 1), minval=4.0, maxval=40.0)
    ph = jax.random.uniform(ks[5], (n, 1, 1, 1), maxval=2 * np.pi)
    tex = 0.15 * jnp.sin(fr * (jnp.cos(th) * yy + jnp.sin(th) * xx) + ph)
    img = img + tex
    img = img + 0.02 * jax.random.normal(ks[7], (n, h, w, 3))
    return jnp.clip(img, 0.0, 1.0)


def _query_views(key, imgs):
    """Random crop-resize + photometric jitter of source images — the
    classic near-duplicate query model. No horizontal flip: a randomly
    initialized backbone has zero flip invariance (flip-TTA is a separate
    pipeline feature), and flipped queries turn the source-retrieval
    sanity check into a coin toss."""
    import jax
    import jax.numpy as jnp

    n, h, w, _ = imgs.shape
    ks = jax.random.split(key, 5)
    scale = jax.random.uniform(ks[0], (n,), minval=0.82, maxval=0.96)
    oy = jax.random.uniform(ks[1], (n,)) * (1.0 - scale)
    ox = jax.random.uniform(ks[2], (n,)) * (1.0 - scale)

    # bilinear sample a scaled window back to (h, w) — per-image map_coords
    yy = jnp.linspace(0.0, 1.0, h)
    xx = jnp.linspace(0.0, 1.0, w)

    def crop_one(img, s, oy_, ox_, flip):
        ys = (oy_ + yy * s) * (h - 1)
        xs = (ox_ + xx * s) * (w - 1)
        y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 2)
        x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 2)
        wy = (ys - y0)[:, None, None]
        wx = (xs - x0)[None, :, None]
        p00 = img[y0][:, x0]
        p01 = img[y0][:, x0 + 1]
        p10 = img[y0 + 1][:, x0]
        p11 = img[y0 + 1][:, x0 + 1]
        out = (p00 * (1 - wy) * (1 - wx) + p01 * (1 - wy) * wx
               + p10 * wy * (1 - wx) + p11 * wy * wx)
        return jnp.where(flip, out[:, ::-1], out)

    flips = jnp.zeros((n,), bool)
    out = jax.vmap(crop_one)(imgs, scale, oy, ox, flips)
    bright = jax.random.uniform(ks[4], (n, 1, 1, 1), minval=0.9,
                                maxval=1.1)
    return jnp.clip(out * bright, 0.0, 1.0)


def extract(args):
    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import os

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    from dirjax.models import create_model
    from dirjax.models.rmac import apply_descriptor

    h, w = args.size, args.size
    if args.checkpoint:   # stage-0 fine-tune (trained spectrum)
        from dirjax.utils.checkpoints import load_native

        ck = load_native(args.checkpoint)
        model, params = ck.model, ck.params
        # load_native returns HOST numpy params; without this device_put
        # every async extract_batch dispatch stages its own copy of the
        # ~190 MB param upload, and 512 queued batches OOM the host
        # (measured: 112 GB RSS before the r5 fix)
        params = jax.device_put(params)
        print(f"extracting with {model.arch} from {args.checkpoint}",
              flush=True)
    else:                 # random init (the r4 flat-spectrum worst case)
        model = create_model(args.arch)
        params = model.init(jax.random.PRNGKey(7))
    cfg = model.config

    @jax.jit
    def extract_batch(key, params):
        imgs = _scene_batch(key, args.batch, h, w)
        return imgs, apply_descriptor(params, imgs, cfg,
                                      dtype=jnp.bfloat16)

    @jax.jit
    def extract_query_batch(key, imgs, params):
        qimgs = _query_views(key, imgs)
        return apply_descriptor(params, qimgs, cfg, dtype=jnp.bfloat16)

    descs, q_descs, src_rows = [], [], []
    nb = args.n_db // args.batch
    nqb = args.n_q // args.batch
    for i in range(nb):
        key = jax.random.PRNGKey(1000 + i)
        imgs, d = extract_batch(key, params)
        descs.append(d)
        if i < nqb:   # queries are jittered views of the first batches
            q_descs.append(extract_query_batch(
                jax.random.PRNGKey(5000 + i), imgs, params))
            src_rows.extend(range(i * args.batch, (i + 1) * args.batch))
        if (i + 1) % 8 == 0:
            print(f"extracted {(i + 1) * args.batch}/{args.n_db}",
                  flush=True)
    db = jnp.concatenate(descs).astype(jnp.float32)
    qd = jnp.concatenate(q_descs).astype(jnp.float32)
    # gate: a wedged/misbehaving chip once emitted all-NaN descriptors and
    # the downstream study silently graded ties as recall 1.0 — fail HERE
    db_ok = bool(jnp.isfinite(db).all())
    q_ok = bool(jnp.isfinite(qd).all())
    if not (db_ok and q_ok):
        raise RuntimeError("extraction produced non-finite descriptors "
                           f"(db finite={db_ok}, q finite={q_ok}) — "
                           "re-run; do not evaluate this file")
    # save RAW descriptors — whitening runs in the evaluate stage (CPU),
    # so whitening-path fixes never force a re-extraction
    np.savez(args.out, db=np.asarray(db), q=np.asarray(qd),
             src=np.asarray(src_rows, np.int64))
    print(f"saved raw {db.shape} db / {qd.shape} q -> {args.out}",
          flush=True)


# --------------------------------------------------------------------------
# stage 2: tier-by-tier recall
# --------------------------------------------------------------------------

def evaluate(args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dirjax.ops.whitening import apply_whitening, fit_pca_device
    from dirjax.serving import (BinaryIndex, IVFPQIndex, PQIndex,
                                RetrievalIndex)
    from dirjax.tuning import exact_ground_truth, recall_at_k, tune

    data = np.load(args.descs)
    # serving pipeline: PCA-whiten (whitenp=0.5) + L2 norm. Random-init
    # descriptors are rank-deficient (rank ~1500 < 2048 here) — the
    # zero-variance guard in apply_whitening keeps dead directions at 0.
    pca = fit_pca_device(data["db"])
    db = np.asarray(apply_whitening(data["db"], pca, whitenp=0.5, dead_floor=1e-7))
    q = np.asarray(apply_whitening(data["q"], pca, whitenp=0.5, dead_floor=1e-7))
    assert np.isfinite(db).all() and np.isfinite(q).all(), \
        "whitened descriptors must be finite"
    n, dim = db.shape
    print(f"{n} x {dim} db, {len(q)} queries", flush=True)
    ks = (1, 10, 100)
    gt = {k: exact_ground_truth(q, db, k) for k in ks}
    # how often is the query's true source image the exact top-1? (sanity
    # that the descriptor space is doing retrieval at all)
    src_top1 = float(np.mean(gt[1][:, 0] == data["src"][:len(q)]))
    # a jittered view should retrieve its source image most of the time;
    # anywhere near chance means the descriptors (or the gt) are garbage
    # and every tier would "pass" by reproducing meaningless ties
    if src_top1 < 0.5:
        raise RuntimeError(
            f"src_is_top1={src_top1:.4f} — the descriptor space is not "
            "doing retrieval (all-ties/NaN extraction?); refusing to "
            "grade compressed tiers against a meaningless ground truth")

    # the variance spectrum the whole tier guidance hinges on: how fast
    # the UNWHITENED descriptor variance concentrates (a trained backbone
    # front-loads it; random init is nearly flat across live directions)
    evr = np.asarray(pca.variance, np.float64)
    share = np.cumsum(evr) / max(evr.sum(), 1e-30)
    spectrum = {f"top{kk}_variance_share": round(float(share[kk - 1]), 4)
                for kk in (16, 64, 256, 1024) if kk <= len(share)}
    spectrum["rank_for_99pct"] = int(np.searchsorted(share, 0.99) + 1)

    results = {"n_db": int(n), "dim": int(dim), "n_q": int(len(q)),
               "src_is_top1": round(src_top1, 4), "spectrum": spectrum,
               "tiers": {}}
    if args.tiers and os.path.exists(args.out):
        # incremental mode: keep previously graded tiers, re-grade matches
        with open(args.out) as f:
            prev = json.load(f)
        if args.section:
            prev = prev.get(args.section, {})
        if prev.get("n_db") == results["n_db"]:
            results["tiers"] = prev.get("tiers", {})
            for key in prev:
                if key.startswith("tuner"):
                    results[key] = prev[key]

    def grade(name, search_fn, note=""):
        if args.tiers and not re.search(args.tiers, name):
            return
        row = {}
        for k in ks:
            idxs = search_fn(k)
            row[f"recall@{k}"] = round(recall_at_k(idxs, gt[k]), 4)
        if note:
            row["note"] = note
        results["tiers"][name] = row
        print(f"{name:34s} " + "  ".join(
            f"R@{k}={row[f'recall@{k}']:.3f}" for k in ks), flush=True)

    def wants(pattern: str) -> bool:
        """Should a (costly) tier group run at all under --tiers?"""
        return not args.tiers or bool(re.search(args.tiers, pattern))

    # --- int8 (and full-int8) --------------------------------------------
    if wants("int8"):
        i8 = RetrievalIndex(db, dtype=jnp.int8)
        grade("int8", lambda k: i8.search(q, k=k)[1])
        grade("int8_w8q",
              lambda k: i8.search(q, k=k, int8_queries=True)[1],
              note="queries quantized too (fastest mode)")

    # --- PQ / OPQ ---------------------------------------------------------
    if wants("pq_m|opq"):
        for m, ksub, tag in ((32, 16, "pq_m32k16"), (16, 256, "pq_m16k256")):
            pq = PQIndex(db, m=m, ksub=ksub, seed=0, train_iters=10)
            grade(tag, lambda k, pq=pq: pq.search(q, k=k)[1])
        opq = PQIndex(db, m=32, ksub=16, opq=True, seed=0, train_iters=10)
        grade("opq_m32k16", lambda k: opq.search(q, k=k)[1])
        pqr = PQIndex(db, m=32, ksub=16, rerank=True, seed=0,
                      train_iters=10)
        for rf in (2, 4, 8):
            grade(f"pq_m32k16_rerank{rf}",
                  lambda k, rf=rf: pqr.search(q, k=k, rerank_factor=rf)[1],
                  note="int8 exact rescore of rf*k ADC candidates")

    # --- PCA-reduced tiers: quantize AFTER dim reduction (the classic
    # PQ recipe — 128-256 bits cannot carry 2048 whitened dims, see the
    # full-dim rows; whitenv is the reference pipeline's own knob) -------
    if wants("pca256"):
        db256 = np.asarray(apply_whitening(data["db"], pca, whitenp=0.5,
                                           whitenv=256, dead_floor=1e-7))
        q256 = np.asarray(apply_whitening(data["q"], pca, whitenp=0.5,
                                          whitenv=256, dead_floor=1e-7))
        grade("pca256_exact",
              lambda k: np.argsort(-(q256 @ db256.T), axis=1)[:, :k],
              note="exact dot in the whitenv=256 space — the dim-"
                   "reduction cost alone, before any quantization")
        pq256 = PQIndex(db256, m=32, ksub=256, seed=0, train_iters=10)
        grade("pca256_pq_m32k256",
              lambda k: pq256.search(q256, k=k)[1],
              note="same 32 B/row as pq_m32k16, spent on 256 dims")
        pq256r = PQIndex(db256, m=32, ksub=256, rerank=True, seed=0,
                         train_iters=10)
        grade("pca256_pq_m32k256_rerank4",
              lambda k: pq256r.search(q256, k=k, rerank_factor=4)[1],
              note="int8(256-D) exact rescore of 4k ADC candidates")
        bi256 = BinaryIndex(db256, n_bits=256, asym=True, seed=0,
                            itq_iters=30)
        grade("pca256_itq256_asym_rf4",
              lambda k: bi256.search(q256, k=k, rerank_factor=4)[1],
              note="32 B/row sign codes in the reduced space, exact asym")

    # --- IVF-PQ -----------------------------------------------------------
    nlist = max(16, int(np.sqrt(n)))
    if wants("ivf|tuner"):
        ivf = IVFPQIndex(db, nlist=nlist, m=32, ksub=16, seed=0,
                         train_iters=10)
        for nprobe in (1, 4, 16, nlist):
            grade(f"ivf_nlist{nlist}_nprobe{nprobe}",
                  lambda k, p=nprobe: ivf.search(q, k=k, nprobe=p)[1])

    # --- IVF with an 8-bit residual ADC (r5 follow-up) --------------------
    # The trained-spectrum study attributed IVF's recall ceiling to its
    # m32/ks16 residual codebooks, not to probing (nprobe=nlist matched
    # the same ADC as a flat scan). Grade the identical cell geometry
    # with ksub=256 (still 32 B/row) plus its flat-scan equivalent, so
    # the cost of probing vs the cost of the ADC stay separable.
    if wants("pq_m32k256_full"):   # NB: also matches ..._rerank4 below
        pq_full256 = PQIndex(db, m=32, ksub=256, seed=0, train_iters=10)
        grade("pq_m32k256_full",
              lambda k: pq_full256.search(q, k=k)[1],
              note="flat-scan equivalent of ivf256's ADC budget")
    if wants("pq_m32k256_full_rerank4"):
        pqr256 = PQIndex(db, m=32, ksub=256, rerank=True, seed=0,
                         train_iters=10)
        grade("pq_m32k256_full_rerank4",
              lambda k: pqr256.search(q, k=k, rerank_factor=4)[1],
              note="int8 exact rescore of 4k ADC candidates")
    if wants("ivf256"):
        ivf256 = IVFPQIndex(db, nlist=nlist, m=32, ksub=256, seed=0,
                            train_iters=10)
        for nprobe in (4, 16):
            grade(f"ivf256_nlist{nlist}_nprobe{nprobe}",
                  lambda k, p=nprobe: ivf256.search(q, k=k, nprobe=p)[1])

    # --- binary ITQ -------------------------------------------------------
    if wants("itq512|itq2048"):
        for bits in (512, 2048):
            nb = min(bits, (dim // 32) * 32)
            # the 2048-bit rotation is a 2048^2 SVD per ITQ iter — 5 iters
            # is near-converged and keeps the CPU stage tractable
            bi = BinaryIndex(db, n_bits=nb, asym=True, seed=0,
                             itq_iters=30 if bits <= 512 else 5)
            sym = BinaryIndex(db, _codec=bi.codec, asym=False)
            grade(f"itq{bits}_hamming",
                  lambda k, sym=sym: sym.search(q, k=k)[1])
            grade(f"itq{bits}_asym_rf4",
                  lambda k, bi=bi: bi.search(q, k=k, rerank_factor=4)[1],
                  note="exact asymmetric ranking (r5 fused search)")

    # --- tuner validation on held-out queries ----------------------------
    if wants("ivf|tuner"):
        half = len(q) // 2
        tuned = tune(ivf, q[:half], descriptors=db, k=10,
                     target=args.target)
        held_idxs = ivf.search(q[half:], k=10, **tuned.params)[1]
        held_recall = recall_at_k(held_idxs, gt[10][half:])
        results["tuner"] = {
            "index": f"ivf_nlist{nlist}", "target": args.target,
            "params": tuned.params, "tune_recall": round(tuned.recall, 4),
            "met": tuned.met,
            "heldout_recall": round(float(held_recall), 4),
        }
        print(f"tune(target={args.target}) -> {tuned.params} "
              f"recall={tuned.recall:.3f} heldout={held_recall:.3f}",
              flush=True)

    # --- tuner validation #2: a tier that CAN meet the target -------------
    # The IVF tuner above honestly reports "not met" on this spectrum (m=32
    # 4-bit ADC over 2048 whitened dims can't separate near-duplicates).
    # Validate the tuner's positive path on a pca256 rerank index, graded
    # against the exact oracle in ITS OWN space (the tuner's contract:
    # recall vs exact search over the same vectors the index serves).
    if wants("tuner_pca256"):
        db256 = np.asarray(apply_whitening(data["db"], pca, whitenp=0.5,
                                           whitenv=256, dead_floor=1e-7))
        q256 = np.asarray(apply_whitening(data["q"], pca, whitenp=0.5,
                                          whitenv=256, dead_floor=1e-7))
        pq256r = PQIndex(db256, m=32, ksub=256, rerank=True, seed=0,
                         train_iters=10)
        half = len(q256) // 2
        tuned = tune(pq256r, q256[:half], descriptors=db256, k=10,
                     target=args.target)
        gt256 = exact_ground_truth(q256[half:], db256, k=10)
        held_idxs = pq256r.search(q256[half:], k=10, **tuned.params)[1]
        held_recall = recall_at_k(held_idxs, gt256)
        results["tuner_pca256"] = {
            "index": "pca256_pq_m32k256_rerank", "target": args.target,
            "params": tuned.params, "tune_recall": round(tuned.recall, 4),
            "met": tuned.met,
            "heldout_recall": round(float(held_recall), 4),
        }
        print(f"tune_pca256(target={args.target}) -> {tuned.params} "
              f"recall={tuned.recall:.3f} met={tuned.met} "
              f"heldout={held_recall:.3f}", flush=True)

    payload = results
    if args.section:
        payload = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                payload = json.load(f)
        payload[args.section] = results
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    where = f"{args.out}[{args.section}]" if args.section else args.out
    print(f"wrote {where}", flush=True)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = p.add_subparsers(dest="cmd", required=True)
    pt = sub.add_parser("train")
    pt.add_argument("--arch", default="resnet101_rmac")
    pt.add_argument("--steps", type=int, default=400)
    pt.add_argument("--batch", type=int, default=16)
    pt.add_argument("--views", type=int, default=4,
                    help="jittered views per class per batch")
    pt.add_argument("--n-classes", type=int, default=256)
    pt.add_argument("--size", type=int, default=224)
    pt.add_argument("--lr", type=float, default=1e-4)
    pt.add_argument("--out", default="ckpt_spectrum.npz")
    pt.set_defaults(fn=train)
    pe = sub.add_parser("extract")
    pe.add_argument("--n-db", type=int, default=16384)
    pe.add_argument("--n-q", type=int, default=256)
    pe.add_argument("--batch", type=int, default=32)
    pe.add_argument("--size", type=int, default=224)
    pe.add_argument("--cpu", action="store_true")
    pe.add_argument("--arch", default="resnet101_rmac")
    pe.add_argument("--checkpoint", default="",
                    help="native checkpoint from the train stage "
                         "(trained-spectrum extraction)")
    pe.add_argument("--out", default=DESC_FILE)
    pe.set_defaults(fn=extract)
    pv = sub.add_parser("evaluate")
    pv.add_argument("--descs", default=DESC_FILE)
    pv.add_argument("--target", type=float, default=0.9)
    pv.add_argument("--out", default=OUT_FILE)
    pv.add_argument("--section", default="",
                    help="nest results under this key in --out (one file "
                         "carries the flat and trained studies)")
    pv.add_argument("--tiers", default="",
                    help="regex: grade only matching tier groups and "
                         "merge into an existing --out (incremental)")
    pv.set_defaults(fn=evaluate)
    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
