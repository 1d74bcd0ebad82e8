"""Descriptor extraction pipeline.

TPU-first replacement for the reference's per-image extraction loop
(``dirtorch/test_dir.py:47-94``) and benchmark evaluation driver
(``test_dir.py:97-180``):

* the host side decodes/transforms images in a thread pool and forms
  static-shape batches (same-shape groups for exact parity, padded buckets +
  masked pooling for throughput — the reference runs batch=1 instead),
* the device side runs the jitted descriptor forward (one XLA compile per
  distinct batch shape, cached), with optional horizontal-flip TTA folded
  into the batch,
* multi-transform (multi-scale) descriptors are pooled on device
  (mean / signed-power gem, ``common.py:41-55``), whitening is a single
  folded matmul, AQE/ADBA are device ops, ranking is an MXU matmul,
* mAP evaluation stays on host (junk-aware protocols need full score rows).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import ops
from .data.loader import get_loader, iterate_batches
from .models import Model
from .utils import evaluation as ev

__all__ = ["extract_image_features", "eval_model", "FeatureExtractor",
           "adaptive_call"]


def adaptive_call(call, images: np.ndarray,
                  mask: Optional[np.ndarray] = None) -> np.ndarray:
    """Run ``call(images, mask)`` but survive device OOM: on
    RESOURCE_EXHAUSTED the batch is split in half recursively (down to
    single images), so oversized batches/resolutions degrade to smaller
    dispatches instead of killing a long extraction run. Works with any
    duck-typed extractor (FeatureExtractor, ShardedExtractor, ...).
    Returns a host array."""
    try:
        return np.asarray(call(images, mask))
    except Exception as e:  # jaxlib.XlaRuntimeError has no stable path
        if "RESOURCE_EXHAUSTED" not in str(e) or len(images) <= 1:
            raise
    half = len(images) // 2
    return np.concatenate([
        adaptive_call(call, images[:half],
                      mask[:half] if mask is not None else None),
        adaptive_call(call, images[half:],
                      mask[half:] if mask is not None else None),
    ])


class FeatureExtractor:
    """Jit-compiled descriptor forward bound to a model + params.

    One compile per distinct (batch, H, W) shape — cached by jax. ``dtype``
    selects the conv compute dtype (fp32 parity / bf16 speed).
    """

    def __init__(self, model: Model, params, dtype=jnp.float32,
                 precision=None, fused_head: Optional[bool] = None,
                 preprocess: Optional[dict] = None):
        """``preprocess``: the checkpoint's mean/std dict — pass
        ``ckpt.preprocess`` when loading saved weights (the schema stores it
        per-checkpoint, reference test_dir.py:183-191); defaults to the
        architecture's ImageNet constants."""
        self.model = model
        self.params = params
        self.dtype = dtype
        self.preprocess = dict(model.preprocess)
        if preprocess:
            self.preprocess.update(preprocess)
        if fused_head is None:
            # the Pallas head kernel targets TPU; elsewhere it falls back
            # to the XLA composition anyway
            fused_head = jax.default_backend() == "tpu"

        cfg = model.config
        pre = self.preprocess
        scale = tuple(1.0 / (255.0 * s) for s in pre["std"])
        offset = tuple(m / s for m, s in zip(pre["mean"], pre["std"]))

        @partial(jax.jit, static_argnames=("with_mask",))
        def _forward(params, images, mask, with_mask):
            from .models.rmac import apply_descriptor

            if images.dtype == jnp.uint8:
                # normalize-on-device path: host ships raw uint8 pixels
                images = (images.astype(jnp.float32)
                          * jnp.asarray(scale, jnp.float32)
                          - jnp.asarray(offset, jnp.float32))
            return apply_descriptor(
                params, images, cfg, mask=mask if with_mask else None,
                dtype=dtype, precision=precision, fused_head=fused_head)

        self._forward = _forward

    def __call__(self, images: np.ndarray, mask: Optional[np.ndarray] = None):
        # with_mask=False never reads the mask: ship a (1,1,1) placeholder
        # instead of a full-size dead buffer on every unmasked dispatch
        out = self._forward(self.params, jnp.asarray(images),
                            jnp.asarray(mask) if mask is not None else
                            jnp.zeros((1, 1, 1), bool),
                            mask is not None)
        return out

    def call_adaptive(self, images: np.ndarray,
                      mask: Optional[np.ndarray] = None) -> np.ndarray:
        """OOM-surviving ``__call__``; see :func:`adaptive_call`."""
        return adaptive_call(self, images, mask)


def extract_image_features(dataset, transforms: str, extractor: FeatureExtractor,
                           *, flip: Optional[Sequence[int]] = None,
                           batching: str = "group", batch_size: int = 8,
                           threads: int = 8, processes: int = 0,
                           bucket_multiple: int = 64,
                           ret_imgs: bool = False,
                           desc: str = "extract", progress: bool = False):
    """Extract a (N, D) descriptor matrix for every image of ``dataset``.

    ``transforms`` is a reference-style chain string (may be '').
    ``flip``: optional per-image 0/1 list — 1 flips the image horizontally
    before the forward (the reference's pop-list TTA, test_dir.py:71-72).
    ``ret_imgs``: also return the transformed device-input images, ordered
    by dataset index (the reference's debug path, test_dir.py:63,76-77);
    the return becomes ``(images, descriptors)``.
    """
    # duck-typed extractors (ShardedExtractor) may not carry preprocess
    preprocess = getattr(extractor, "preprocess", None) or \
        extractor.model.preprocess
    loader = get_loader(dataset, trf_chain=transforms, preprocess=preprocess,
                        output=("img",), totensor=True, device_normalize=True)
    order = range(len(dataset))

    n = len(dataset)
    out: Optional[np.ndarray] = None
    imgs_out: list = [None] * n if ret_imgs else []
    done = 0
    batches = iterate_batches(loader, order, batch_size=batch_size,
                              threads=threads, processes=processes,
                              batching=batching,
                              bucket_multiple=bucket_multiple)
    if progress:
        import tqdm

        batches = tqdm.tqdm(batches, desc=desc)
    pending = None  # (indices, device descriptors, host batch) in flight

    def flush(pending_):
        nonlocal out
        idxs, dev, imgs_, mask_ = pending_
        try:
            descs = np.asarray(dev)         # blocks until the device is done
        except Exception as e:  # device OOM: retry the batch in halves
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            # adaptive_call works for ANY duck-typed extractor (incl.
            # ShardedExtractor, which defines only __call__/preprocess)
            descs = adaptive_call(extractor, imgs_, mask_)
        if out is None:
            out = np.zeros((n, descs.shape[1]), np.float32)
        out[idxs] = descs

    for batch in batches:
        images = batch.images
        if flip is not None:
            for r, idx in enumerate(batch.indices):
                if flip[idx]:
                    if batch.mask is None:
                        images[r] = images[r, :, ::-1]
                    else:
                        # flip only the valid region so it stays aligned
                        # with the validity mask of the padded canvas
                        w = int(batch.mask[r][0].sum())
                        images[r, :, :w] = images[r, :, w - 1::-1]
        # one-deep pipeline: dispatch this batch (jax dispatch is async),
        # THEN pull the previous batch's result — the device computes batch
        # i while the host decodes/uploads batch i+1
        dev = extractor(images, batch.mask)
        if pending is not None:
            flush(pending)
        pending = (batch.indices, dev, images, batch.mask)
        if ret_imgs:
            for r, idx in enumerate(batch.indices):
                if batch.mask is None:
                    imgs_out[idx] = np.asarray(images[r])
                else:  # un-pad back to the image's real extent
                    h = int(batch.mask[r, :, 0].sum())
                    w = int(batch.mask[r, 0, :].sum())
                    imgs_out[idx] = np.asarray(images[r, :h, :w])
        done += len(batch.indices)
    if pending is not None:
        flush(pending)
    assert done == n, f"extracted {done}/{n} images"
    if out is None:  # empty dataset: keep the (0, D) contract
        out = np.zeros((0, extractor.model.config.out_dim), np.float32)
    if ret_imgs:
        return imgs_out, out
    return out


def eval_model(db, extractor: FeatureExtractor, trfs="", *, pooling="mean",
               gemp=3, detailed=False, whiten=None, aqe=None, adba=None,
               tta=None, threads=8, processes=0, batch_size=8,
               batching="group", save_feats=None, load_feats=None,
               score_chunk=None, progress=False) -> dict:
    """Full benchmark evaluation (reference ``eval_model``, test_dir.py:97-180):
    extract DB+query descriptors over one or more transform chains, pool,
    whiten, expand, rank, and compute mAP / top-k under the dataset's
    protocol.

    ``whiten``: None or a dict {'pca': PCAParams, 'whitenp':, 'whitenv':,
    'whitenm':} (the reference reads args.whiten + net.pca).
    ``aqe`` / ``adba``: None or {'k':, 'alpha':}.
    ``tta``: None or 'flip' — horizontal-flip test-time augmentation: every
    transform chain is additionally extracted with all images mirrored and
    the extra descriptors enter the multi-chain pooling (the reference's
    flip pop-list TTA, test_dir.py:71-72; BASELINE configs[2]).

    ``score_chunk``: DB rows scored per device dispatch. Junk-aware
    protocols need FULL score rows (reference generic.py:204-208), so large
    databases chunk the scoring — never top-k — and assemble rows on host.
    Default None auto-chunks once the fp32 database would exceed ~1 GB of
    HBM; pass an int to force a chunk size, 0 to force dense.
    """
    if tta not in (None, "", "flip"):
        raise ValueError(f"unknown tta mode: {tta!r}")
    query_db = db.get_query_db()

    if load_feats:
        import os

        bdescs = np.load(os.path.join(load_feats, "feats.bdescs.npy"))
        qdescs = (np.load(os.path.join(load_feats, "feats.qdescs.npy"))
                  if query_db is not db else bdescs)
    else:
        trfs_list = [trfs] if isinstance(trfs, str) else list(trfs)
        kw = dict(batch_size=batch_size, threads=threads, processes=processes,
                  progress=progress)
        bl, ql = [], []
        for chain in trfs_list:
            bl.append(extract_image_features(
                db, chain, extractor, batching=batching, desc="DB", **kw))
            ql.append(bl[-1] if db is query_db else extract_image_features(
                query_db, chain, extractor, batching=batching, desc="query",
                **kw))
            if tta == "flip":
                bl.append(extract_image_features(
                    db, chain, extractor, batching=batching, desc="DB/flip",
                    flip=[1] * len(db), **kw))
                ql.append(bl[-1] if db is query_db else extract_image_features(
                    query_db, chain, extractor, batching=batching,
                    desc="query/flip", flip=[1] * len(query_db), **kw))
        bdescs = np.asarray(ops.pool_descriptors(
            [jnp.asarray(d) for d in bl], pooling, gemp))
        qdescs = np.asarray(ops.pool_descriptors(
            [jnp.asarray(d) for d in ql], pooling, gemp))

    if save_feats:
        import os

        os.makedirs(save_feats, exist_ok=True)
        np.save(os.path.join(save_feats, "feats.bdescs.npy"), bdescs)
        if query_db is not db:
            np.save(os.path.join(save_feats, "feats.qdescs.npy"), qdescs)

    if whiten is not None:
        wkw = {k: v for k, v in whiten.items() if k != "pca"}
        bdescs = np.asarray(ops.apply_whitening(bdescs, whiten["pca"], **wkw))
        qdescs = np.asarray(ops.apply_whitening(qdescs, whiten["pca"], **wkw))

    if adba is not None:
        bdescs = np.asarray(ops.expand_database(bdescs, **adba))
    if aqe is not None:
        qdescs = np.asarray(ops.expand_queries(qdescs, bdescs, **aqe))

    if score_chunk is None and bdescs.size > 2 ** 28:
        # auto: chunk so one dispatch streams ~1 GB of fp32 DB rows
        score_chunk = max(4096, 2 ** 28 // max(1, bdescs.shape[1]))
    if score_chunk:
        scores = ops.compute_scores_chunked(qdescs, bdescs,
                                            chunk=int(score_chunk))
    else:
        scores = np.asarray(ops.compute_scores(qdescs, bdescs))

    res: dict = {}
    try:
        aps = [db.eval_query_AP(q, scores[q]) for q in range(len(scores))]
        if not aps:
            pass  # no queries -> no mAP entries (don't crash on aps[0])
        elif not isinstance(aps[0], dict):
            aps = [float(a) for a in aps]
            if detailed:
                res["APs"] = aps
            res["mAP"] = ev.mean_excluding_invalid(aps)
        else:
            for mode in aps[0]:
                vals = [float(a[mode]) for a in aps]
                if detailed:
                    res["APs-" + mode] = vals
                res["mAP-" + mode] = ev.mean_excluding_invalid(vals)
    except NotImplementedError:
        pass

    try:
        tops = [db.eval_query_top(q, scores[q]) for q in range(len(scores))]
        if tops:
            if detailed:
                res["tops"] = tops
            for k in tops[0]:
                res[f"top{k}"] = float(np.mean([t[k] for t in tops]))
    except NotImplementedError:
        pass

    return res
