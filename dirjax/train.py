"""Training: AP-loss fine-tuning of descriptor models.

The reference ships the losses and the support machinery (BalancedSampler
``pytorch_loader.py:184-249``, BN freezing ``common.py:187-202``,
checkpoint save ``common.py:102-114``) but no train entry point
(README.md:26; training happened in NAVER-internal code). This module
completes the story TPU-first:

* listwise AP-loss on in-batch similarity matrices (each image queries the
  rest of the batch — the Siamese multi-crop recipe of Revaud et al.),
* BatchNorm statistics frozen (the fine-tuning recipe; BN is inference-mode
  affine in the forward) with optionally-frozen BN scale/bias via an optax
  mask,
* one jitted train step; :func:`make_sharded_train_step` adds mesh
  shardings — batch over "data" (DP), the FC projection over "db" (TP) —
  and lets GSPMD insert the ICI collectives,
* checkpoint/resume in the native npz format incl. optimizer state, with
  the reference's ``.best`` copy behavior.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import loss as losses
from .data.loader import BalancedSampler, get_loader, iterate_batches
from .models import Model, create_model
from .models.rmac import apply_descriptor
from .utils.checkpoints import Checkpoint, load_native, save_native

__all__ = ["TrainConfig", "make_loss", "batch_ap_loss", "make_lr_schedule",
           "make_two_pass_train_step", "make_batch_objective",
           "batch_hard_triplet_loss",
           "make_optimizer", "make_train_step", "make_sharded_train_step",
           "fit", "save_checkpoint"]


@dataclass
class TrainConfig:
    arch: str = "resnet101_rmac"
    out_dim: int = 2048
    loss: str = "ap"        # 'ap' | 'tap' | 'taps' | 'triplet' | 'tripletlogexp'
    nq: int = 25
    margin: float = 1.0         # triplet margin (torch default)
    learning_rate: float = 1e-4
    lr_schedule: str = "constant"   # 'constant' | 'cosine' | 'step'
    lr_decay: float = 0.1           # step-schedule decay factor
    lr_decay_steps: int = 0         # step-schedule period (0: total_steps/3)
    warmup_steps: int = 0           # linear warmup prepended to any schedule
    weight_decay: float = 1e-6
    momentum: float = 0.9
    optimizer: str = "adam"     # 'adam' | 'sgd'
    freeze_bn: bool = True
    epochs: int = 1
    batch_size: int = 16
    #: Siamese multi-crop batches (BASELINE configs[4]): each sampled image
    #: appears this many times per batch, each through an independent draw
    #: of the random transform chain — in-batch positives at multiple crops
    crops_per_image: int = 1
    image_size: int = 224
    trfs: str = "RandomScale(256,288), RandomCrop(224), RandomFlip()"
    seed: int = 0
    threads: int = 8
    #: two-stage backprop (AP-GeM's "multistaged" trick, TPU-native):
    #: descriptors are computed grad-free in a scan, the listwise loss is
    #: differentiated at the descriptor boundary, then each microbatch is
    #: recomputed under jax.vjp against its descriptor cotangent — exact
    #: listwise gradients with O(microbatch) activation memory instead of
    #: O(batch). 0 disables; must divide batch_size.
    microbatch: int = 0
    #: loader policy for corrupt/undecodable images: 'raise' or 'skip'
    #: (skip keeps long crawls alive; skipped samples are warned about)
    on_error: str = "raise"


def make_loss(cfg: TrainConfig):
    # in-batch cosine scores live in [-1, 1]
    if cfg.loss == "ap":
        return losses.APLoss(nq=cfg.nq, min=-1.0, max=1.0)
    if cfg.loss == "tap":
        return losses.TAPLoss(nq=cfg.nq, min=-1.0, max=1.0)
    if cfg.loss == "taps":
        return losses.TAPLoss(nq=cfg.nq, min=-1.0, max=1.0, simplified=True)
    if cfg.loss == "triplet":
        return losses.TripletMarginLoss(margin=cfg.margin)
    if cfg.loss == "tripletlogexp":
        return losses.TripletLogExpLoss()
    raise ValueError(f"unknown loss {cfg.loss}")


def make_batch_objective(cfg: TrainConfig):
    """(descs, labels) -> scalar loss: listwise AP over in-batch scores for
    the AP family, batch-hard mined triplets for the TL family (the
    reference's Resnet101-TL-* checkpoints are triplet-trained)."""
    loss_fn = make_loss(cfg)
    if cfg.loss in ("triplet", "tripletlogexp"):
        return partial(batch_hard_triplet_loss, loss_fn=loss_fn)
    return partial(batch_ap_loss, loss_fn=loss_fn)


def _offdiag_indices(n: int) -> np.ndarray:
    """(n, n-1) column indices excluding the diagonal (each image ranks the
    rest of the batch, never itself)."""
    idx = np.arange(n)[None, :].repeat(n, axis=0)
    return np.stack([row[row != i] for i, row in enumerate(idx)])


def batch_ap_loss(descs, labels, loss_fn):
    """Listwise loss over the in-batch similarity matrix."""
    n = descs.shape[0]
    scores = jnp.matmul(descs, descs.T, preferred_element_type=jnp.float32)
    match = (labels[:, None] == labels[None, :]).astype(jnp.float32)
    cols = jnp.asarray(_offdiag_indices(n))
    scores_od = jnp.take_along_axis(scores, cols, axis=1)
    match_od = jnp.take_along_axis(match, cols, axis=1)
    # queries with no in-batch positive contribute AP=0 either way; weight
    # them out so the mean is over informative queries
    has_pos = (match_od.sum(axis=1) > 0).astype(jnp.float32)
    qw = has_pos / jnp.maximum(has_pos.sum(), 1.0) * n
    return loss_fn(jnp.clip(scores_od, -1.0, 1.0), match_od, qw=qw)


def batch_hard_triplet_loss(descs, labels, loss_fn):
    """Batch-hard triplet mining: each anchor pairs with its FARTHEST
    same-label row and NEAREST different-label row (the standard in-batch
    mining for the reference's TL checkpoints); anchors lacking a positive
    or a negative are weighted out of the mean."""
    n = descs.shape[0]
    # the loss classes' own distance (|a - b + eps|^p) for exact parity
    d = losses._pairwise_distance(descs[:, None, :], descs[None, :, :],
                                  loss_fn.p, loss_fn.eps)       # (n, n)
    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(n, dtype=bool)
    pos_mask = same & ~eye
    neg_mask = ~same
    d_p = jnp.max(jnp.where(pos_mask, d, -jnp.inf), axis=1)
    d_n = jnp.min(jnp.where(neg_mask, d, jnp.inf), axis=1)
    valid = jnp.isfinite(d_p) & jnp.isfinite(d_n)
    per = loss_fn.from_distances(jnp.where(valid, d_p, 0.0),
                                 jnp.where(valid, d_n, 1.0))
    per = jnp.where(valid, per, 0.0)
    return jnp.sum(per) / jnp.maximum(jnp.sum(valid), 1)


def _bn_labels(params):
    """optax.multi_transform label pytree: 'freeze' on BatchNorm leaves."""

    def walk(node, in_bn=False):
        if isinstance(node, dict):
            return {k: walk(v, in_bn or k.startswith("bn") or k == "bn")
                    for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, in_bn) for v in node]
        return "freeze" if in_bn else "train"

    return walk(params)


def make_lr_schedule(cfg: TrainConfig, total_steps: Optional[int] = None):
    """Learning-rate schedule from the config; ``total_steps`` sizes the
    cosine decay (and the default step period)."""
    base = cfg.learning_rate
    if cfg.lr_schedule == "constant":
        sched = base
    elif cfg.lr_schedule == "cosine":
        assert total_steps, "cosine schedule needs the total step count"
        sched = optax.cosine_decay_schedule(
            base, max(1, total_steps - cfg.warmup_steps))
    elif cfg.lr_schedule == "step":
        period = cfg.lr_decay_steps or max(1, (total_steps or 3) // 3)
        sched = optax.exponential_decay(base, period, cfg.lr_decay,
                                        staircase=True)
    else:
        raise ValueError(f"unknown lr_schedule: {cfg.lr_schedule}")
    if cfg.warmup_steps:
        warmup = optax.linear_schedule(0.0, base, cfg.warmup_steps)
        if cfg.lr_schedule == "constant":
            return warmup  # linear_schedule holds its end value afterwards
        sched = optax.join_schedules([warmup, sched], [cfg.warmup_steps])
    return sched


def make_optimizer(cfg: TrainConfig, params, total_steps: Optional[int] = None):
    lr = make_lr_schedule(cfg, total_steps)
    if cfg.optimizer == "adam":
        tx = optax.adamw(lr, weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(lr, momentum=cfg.momentum))
    else:
        raise ValueError(cfg.optimizer)
    if cfg.freeze_bn:
        # NB: optax.masked would pass raw gradients through for the frozen
        # leaves; multi_transform + set_to_zero actually freezes them
        tx = optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()},
                                   _bn_labels(params))
    return tx


def _two_pass_loss_and_grads(params, images, labels, fwd, objective, m: int):
    """Loss + parameter grads via backprop split at the descriptor boundary
    (see make_two_pass_train_step). ``m`` is the microbatch size."""
    b = images.shape[0]
    n_micro = b // m
    im = images.reshape((n_micro, m) + images.shape[1:])

    # (1) descriptors only; per-iteration activations die with the scan
    descs = jax.lax.map(lambda xb: fwd(params, xb), im)
    descs = descs.reshape(b, -1)

    # (2) listwise loss + its gradient at the descriptor boundary
    loss_val, ddescs = jax.value_and_grad(
        lambda d: objective(d, labels))(descs)
    ddescs = ddescs.reshape(n_micro, m, -1)

    # (3) accumulate parameter grads one microbatch at a time
    def acc(carry, xs):
        xb, db = xs
        _, vjp = jax.vjp(lambda p: fwd(p, xb), params)
        return jax.tree.map(jnp.add, carry, vjp(db)[0]), None

    zeros = jax.tree.map(jnp.zeros_like, params)
    grads, _ = jax.lax.scan(acc, zeros, (im, ddescs))
    return loss_val, grads


def make_train_step(model: Model, cfg: TrainConfig, tx, dtype=jnp.float32):
    batch_obj = make_batch_objective(cfg)
    mcfg = model.config

    @jax.jit
    def step(params, opt_state, images, labels):
        def objective(p):
            descs = apply_descriptor(p, images, mcfg, dtype=dtype, train=True)
            return batch_obj(descs, labels)

        loss_val, grads = jax.value_and_grad(objective)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_val

    return step


def make_two_pass_train_step(model: Model, cfg: TrainConfig, tx,
                             dtype=jnp.float32):
    """Memory-bounded train step with EXACT listwise gradients.

    The listwise AP loss couples every descriptor in the batch, so naive
    microbatching would change its semantics and plain reverse-mode autodiff
    stores activations for the whole batch. This step instead splits
    backprop at the descriptor boundary (the AP-GeM recipe the reference's
    released checkpoints were trained with):

      1. forward every microbatch grad-free under ``lax.map`` — only the
         (B, D) descriptors survive;
      2. differentiate the loss w.r.t. descriptors (tiny);
      3. ``lax.scan`` over microbatches: recompute the forward under
         ``jax.vjp`` and pull the per-microbatch descriptor cotangent back
         to parameter gradients, summing into a params-sized accumulator.

    Peak activation memory is O(microbatch) regardless of batch size; the
    extra cost is one recomputed forward (the same trade ``jax.checkpoint``
    makes, placed at the semantically-forced boundary).
    """
    batch_obj = make_batch_objective(cfg)
    mcfg = model.config
    m = cfg.microbatch
    assert m > 0 and cfg.batch_size % m == 0, \
        f"microbatch {m} must divide batch_size {cfg.batch_size}"

    def fwd(p, xb):
        return apply_descriptor(p, xb, mcfg, dtype=dtype, train=True)

    @jax.jit
    def step(params, opt_state, images, labels):
        loss_val, grads = _two_pass_loss_and_grads(params, images, labels,
                                                   fwd, batch_obj, m)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_val

    return step


def make_sharded_train_step(model: Model, cfg: TrainConfig, tx, mesh,
                            dtype=jnp.float32):
    """Train step with explicit mesh shardings: DP over "data" (batch),
    TP over "db" (the FC projection's output features + descriptor dim).
    GSPMD inserts the all-gather/psum collectives over ICI.

    ``cfg.microbatch`` composes with the shardings: the two-pass gradient
    path scans over microbatches whose rows keep their "data" sharding, so
    each chip holds activations for microbatch/n_data images at a time."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_obj = make_batch_objective(cfg)
    mcfg = model.config

    def param_sharding(params):
        def walk(node, path=()):
            if isinstance(node, dict):
                return {k: walk(v, path + (k,)) for k, v in node.items()}
            if isinstance(node, list):
                return [walk(v, path) for v in node]
            if path[-2:] == ("fc", "kernel"):
                return NamedSharding(mesh, P(None, "db"))   # TP: output dim
            if path[-2:] == ("fc", "bias"):
                return NamedSharding(mesh, P("db"))
            return NamedSharding(mesh, P())
        return walk(params)

    batch_sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def shard_args(params, opt_state, images, labels):
        psh = param_sharding(params)
        params = jax.device_put(params, psh)
        opt_state = jax.device_put(
            opt_state, jax.tree.map(lambda _: rep, opt_state))
        images = jax.device_put(images, batch_sh)
        labels = jax.device_put(labels, batch_sh)
        return params, opt_state, images, labels

    @jax.jit
    def step(params, opt_state, images, labels):
        if cfg.microbatch:
            loss_val, grads = _two_pass_loss_and_grads(
                params, images, labels,
                lambda p, xb: apply_descriptor(p, xb, mcfg, dtype=dtype,
                                               train=True),
                batch_obj, cfg.microbatch)
        else:
            def objective(p):
                descs = apply_descriptor(p, images, mcfg, dtype=dtype,
                                         train=True)
                return batch_obj(descs, labels)

            loss_val, grads = jax.value_and_grad(objective)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_val

    return step, shard_args


def save_checkpoint(state: Checkpoint, is_best: bool, filename: str):
    """Native-format save with the reference's `.best` copy semantics
    (common.py:102-114)."""
    try:
        save_native(filename, state)
        if is_best:
            import shutil

            shutil.copyfile(filename, filename + ".best")
            filename = filename + ".best"
        print("saving to " + filename)
    except OSError as e:
        print(f"Error: Could not save checkpoint at {filename}, skipping ({e})")


def _save_opt_state(path: str, opt_state) -> None:
    """Persist an optax state as numbered leaves (the tree structure is
    reconstructed from a fresh tx.init on resume)."""
    leaves = jax.tree.leaves(opt_state)
    arrays = {f"leaf{i:05d}": np.asarray(v) for i, v in enumerate(leaves)}
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def _load_opt_state(path: str, template):
    with np.load(path, allow_pickle=False) as data:
        leaves = [data[f"leaf{i:05d}"] for i in range(len(data.files))]
    treedef = jax.tree.structure(template)
    return jax.tree.unflatten(treedef, leaves)


def evaluate_val_loss(model, params, cfg: TrainConfig, val_dataset,
                      dtype=jnp.float32) -> float:
    """Mean in-batch loss over the validation dataset (deterministic
    center-crop chain). Uses the same batch objective as the train step, so
    the triplet family (batch-hard mining) validates with the loss it
    trains with — not the listwise AP path, whose call signature the
    triplet losses don't even share."""
    batch_obj = make_batch_objective(cfg)
    mcfg = model.config

    @jax.jit
    def val_step(params, images, labels):
        descs = apply_descriptor(params, images, mcfg, dtype=dtype)
        return batch_obj(descs, labels)

    chain = f"Scale({cfg.image_size + 32}), CenterCrop({cfg.image_size})"
    loader = get_loader(val_dataset, chain, preprocess=model.preprocess,
                        output=("img", "label"), totensor=True)
    losses_v = []
    for batch in iterate_batches(loader, range(len(val_dataset)),
                                 batch_size=cfg.batch_size,
                                 threads=cfg.threads, batching="group"):
        if len(batch.indices) < 2:
            continue
        losses_v.append(float(val_step(params, jnp.asarray(batch.images),
                                       jnp.asarray(batch.fields["label"]))))
    return float(np.mean(losses_v)) if losses_v else float("nan")


def evaluate_retrieval(model, params, eval_db, cfg: TrainConfig,
                       dtype=jnp.float32, trfs: str = "") -> dict:
    """mAP of the current params on a retrieval benchmark (the metric that
    actually matters for model selection; loss is only a proxy)."""
    from .extraction import FeatureExtractor, eval_model

    extractor = FeatureExtractor(model, params, dtype=dtype)
    return eval_model(eval_db, extractor, trfs, threads=cfg.threads)


def _retrieval_monitor(res: dict) -> Optional[float]:
    """Scalar to MINIMIZE from an eval_model result: -mAP (medium when the
    protocol is revisited)."""
    for key in ("mAP-medium", "mAP"):
        if key in res:
            return -float(res[key])
    return None


def fit(dataset, cfg: TrainConfig, *, val_dataset=None, params=None,
        out_dir: Optional[str] = None, dtype=jnp.float32,
        steps_per_epoch: Optional[int] = None, progress: bool = False,
        resume: Optional[str] = None, eval_dataset=None, eval_trfs: str = "",
        mesh=None, ckpt_format: str = "npz"):
    """Fine-tune on a labeled dataset; returns (model, params, history).

    ``resume``: path to a checkpoint.npz written by a previous fit — params,
    optimizer state and epoch counter are restored (reference
    load_checkpoint's resume semantics, common.py:117-147).

    ``eval_dataset``: a retrieval benchmark evaluated each epoch; its mAP
    is recorded in the history and becomes the best-checkpoint monitor
    (preferred over val_loss — select by the metric you deploy on).

    ``mesh``: a ``jax.sharding.Mesh`` (e.g. ``parallel.make_mesh(4, 2)``)
    — the train step runs SPMD via :func:`make_sharded_train_step`: batch
    rows DP-sharded over "data", the FC projection TP-sharded over "db",
    GSPMD inserting the ICI collectives (the multi-chip replacement for
    the reference's ``nn.DataParallel``, common.py:150-175). Ragged
    batches are truncated to a multiple of the "data" axis size.

    ``ckpt_format``: ``"npz"`` (default — the interop format, gathered to
    host each epoch) or ``"orbax"`` — sharded async checkpoints under
    ``out_dir/orbax`` (:mod:`dirjax.utils.orbax_ckpt`): the write
    overlaps the next epoch and sharded params/opt-state never gather.
    ``resume`` accepts either a ``checkpoint.npz`` path or an orbax
    checkpoint *directory* (auto-detected)."""
    from .utils.orbax_ckpt import TrainCheckpointer, is_orbax_dir

    assert ckpt_format in ("npz", "orbax"), ckpt_format
    model = create_model(cfg.arch, out_dim=cfg.out_dim)
    if params is None:
        params = model.init(jax.random.PRNGKey(cfg.seed))

    start_epoch = 0
    opt_path = None
    orbax_resume = None
    best = float("inf")
    if resume and is_orbax_dir(resume):
        orbax_resume = resume        # restored after tx.init (needs the
        resume = None                # opt-state template)
    if resume:
        ckpt = load_native(resume)
        assert ckpt.model.arch == cfg.arch, \
            f"resume arch {ckpt.model.arch} != config arch {cfg.arch}"
        params = ckpt.params
        start_epoch = int(ckpt.extra.get("epoch", -1)) + 1
        # restore the best monitor so a post-resume epoch can't silently
        # overwrite checkpoint.npz.best with a worse model
        best = float(ckpt.extra.get("best", float("inf")))
        opt_path = resume + ".opt"

    loader = get_loader(dataset, cfg.trfs, preprocess=model.preprocess,
                        output=("img", "label"), totensor=True,
                        on_error=cfg.on_error)
    sampler = BalancedSampler(dataset, rng=np.random.default_rng(cfg.seed))

    # total optimizer steps (sizes cosine/step schedules): sampler draws x
    # crops per epoch, optionally truncated by steps_per_epoch
    per_epoch = len(sampler) * cfg.crops_per_image
    if steps_per_epoch:
        per_epoch = min(per_epoch, steps_per_epoch * cfg.batch_size)
    total_steps = max(1, per_epoch // cfg.batch_size) * cfg.epochs

    tx = make_optimizer(cfg, params, total_steps=total_steps)
    opt_state = tx.init(params)
    if opt_path and os.path.exists(opt_path):
        opt_state = _load_opt_state(opt_path, opt_state)
    if orbax_resume:
        with TrainCheckpointer(orbax_resume) as ck:
            rex = ck.read_extra()
            assert rex.get("arch", cfg.arch) == cfg.arch, \
                f"resume arch {rex.get('arch')} != config arch {cfg.arch}"
            params, opt_state, _ = ck.restore(params, opt_state)
        start_epoch = int(rex.get("epoch", -1)) + 1
        best = float(rex.get("best", float("inf")))
    shard_args = None
    if mesh is not None:
        step, shard_args = make_sharded_train_step(model, cfg, tx, mesh,
                                                   dtype=dtype)
        n_data = mesh.shape["data"]
        assert cfg.batch_size % n_data == 0, \
            f"batch_size {cfg.batch_size} must divide by data axis {n_data}"
    elif cfg.microbatch:
        step = make_two_pass_train_step(model, cfg, tx, dtype=dtype)
    else:
        step = make_train_step(model, cfg, tx, dtype=dtype)

    history = []
    orbax_ckptr = None
    for epoch in range(start_epoch, cfg.epochs):
        order = list(iter(sampler))
        if cfg.crops_per_image > 1:
            # adjacent repeats land in the same batch; each repeat gets an
            # independent random-transform draw (Siamese multi-crop)
            order = [i for i in order for _ in range(cfg.crops_per_image)]
        if steps_per_epoch:
            order = order[: steps_per_epoch * cfg.batch_size]
        epoch_losses = []
        batches = iterate_batches(loader, order, batch_size=cfg.batch_size,
                                  threads=cfg.threads, batching="group")
        if progress:
            import tqdm

            batches = tqdm.tqdm(batches, desc=f"epoch {epoch}")
        for batch in batches:
            if len(batch.indices) < 2:
                continue
            images, labels = batch.images, batch.fields["label"]
            # leftover group batches: truncate to a microbatch and/or
            # data-axis multiple (the balanced sampler re-draws them next
            # epoch)
            multiple = max(1, cfg.microbatch)
            if mesh is not None:
                import math

                multiple = math.lcm(multiple, mesh.shape["data"])
            if multiple > 1:
                keep = len(images) // multiple * multiple
                if keep < 2:
                    continue
                images, labels = images[:keep], labels[:keep]
            images, labels = jnp.asarray(images), jnp.asarray(labels)
            if shard_args is not None:
                params, opt_state, images, labels = shard_args(
                    params, opt_state, images, labels)
            params, opt_state, loss_val = step(
                params, opt_state, images, labels)
            epoch_losses.append(float(loss_val))
        mean_loss = float(np.mean(epoch_losses)) if epoch_losses else float("nan")
        record = {"epoch": epoch, "loss": mean_loss}
        monitor = mean_loss
        if val_dataset is not None:
            record["val_loss"] = evaluate_val_loss(model, params, cfg,
                                                   val_dataset, dtype=dtype)
            monitor = record["val_loss"]
        if eval_dataset is not None:
            res = evaluate_retrieval(model, params, eval_dataset, cfg,
                                     dtype=dtype, trfs=eval_trfs)
            record.update({k: v for k, v in res.items()
                           if isinstance(v, float)})
            m = _retrieval_monitor(res)
            if m is not None:
                monitor = m  # select by mAP when a benchmark is given
        history.append(record)
        is_best = monitor < best
        best = min(best, monitor)
        if out_dir:
            extra = {"epoch": epoch}
            if np.isfinite(best):
                extra["best"] = float(best)
            if ckpt_format == "orbax":
                if orbax_ckptr is None:
                    orbax_ckptr = TrainCheckpointer(
                        os.path.join(out_dir, "orbax"))
                orbax_ckptr.save(epoch, params, opt_state,
                                 extra={**extra, "arch": cfg.arch,
                                        "monitor": float(monitor)})
            else:
                path = os.path.join(out_dir, "checkpoint.npz")
                ckpt = Checkpoint(model=model, params=params,
                                  preprocess=model.preprocess, extra=extra)
                save_checkpoint(ckpt, is_best, path)
                _save_opt_state(path + ".opt", opt_state)
    if orbax_ckptr is not None:
        orbax_ckptr.wait()
        orbax_ckptr.close()
    return model, params, history


if __name__ == "__main__":
    from .cli.train import main as _cli_main

    _cli_main()
