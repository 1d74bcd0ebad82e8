"""Training CLI — completes the story the reference leaves internal
(README.md:26 "training [...] code for those losses"; no train entry point
ships upstream). Fine-tunes a descriptor model with the listwise AP loss on
a labeled dataset (e.g. Landmarks_clean), BN frozen, and writes native
checkpoints that ``python -m dirjax.test_dir`` consumes directly.

Example:
    python -m dirjax.train --dataset Landmarks_clean --arch resnet101_rmac \
        --loss ap --epochs 10 --batch-size 64 --out-dir runs/r101-ap
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Fine-tune a descriptor model")
    parser.add_argument("--dataset", "-d", type=str, required=True,
                        help="labeled dataset spec, e.g. Landmarks_clean")
    parser.add_argument("--val-dataset", type=str, default=None,
                        help="labeled dataset for per-epoch val loss")
    parser.add_argument("--eval-dataset", type=str, default=None,
                        help="retrieval benchmark evaluated each epoch; its "
                             "mAP becomes the best-checkpoint monitor")
    parser.add_argument("--eval-trfs", type=str, default="",
                        help="transform chain for --eval-dataset extraction")
    parser.add_argument("--arch", type=str, default="resnet101_rmac")
    parser.add_argument("--out-dim", type=int, default=2048)
    parser.add_argument("--loss", type=str, default="ap",
                        choices=("ap", "tap", "taps", "triplet",
                                 "tripletlogexp"),
                        help="ap family = listwise; triplet family = "
                             "batch-hard mined (the reference's TL models)")
    parser.add_argument("--nq", type=int, default=25, help="AP quantizer bins")
    parser.add_argument("--margin", type=float, default=1.0,
                        help="triplet margin")
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--lr-schedule", type=str, default="constant",
                        choices=("constant", "cosine", "step"))
    parser.add_argument("--lr-decay", type=float, default=0.1,
                        help="step-schedule decay factor")
    parser.add_argument("--lr-decay-steps", type=int, default=0,
                        help="step-schedule period in optimizer steps")
    parser.add_argument("--warmup-steps", type=int, default=0)
    parser.add_argument("--crops-per-image", type=int, default=1,
                        help="Siamese multi-crop: repeats of each sampled "
                             "image per batch, each a fresh random crop")
    parser.add_argument("--weight-decay", type=float, default=1e-6)
    parser.add_argument("--optimizer", type=str, default="adam",
                        choices=("adam", "sgd"))
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--microbatch", type=int, default=0,
                        help="two-stage backprop: recompute forwards in "
                             "microbatches of this size — exact listwise "
                             "gradients at O(microbatch) activation memory "
                             "(0 = whole-batch autodiff)")
    parser.add_argument("--steps-per-epoch", type=int, default=None)
    parser.add_argument("--trfs", type=str,
                        default="RandomScale(256,288), RandomCrop(224), RandomFlip()")
    parser.add_argument("--no-freeze-bn", action="store_true",
                        help="train BatchNorm scale/bias too")
    parser.add_argument("--checkpoint", type=str, default="",
                        help="initialize from a checkpoint (.pt or .npz)")
    parser.add_argument("--delete-fc", action="store_true",
                        help="drop the checkpoint's FC (new out_dim)")
    parser.add_argument("--resume", type=str, default="",
                        help="resume from a previous fit's checkpoint.npz "
                             "(or an orbax checkpoint directory)")
    parser.add_argument("--ckpt-format", type=str, default="npz",
                        choices=("npz", "orbax"),
                        help="npz: host-gathered interop checkpoints; "
                             "orbax: sharded async checkpoints under "
                             "OUT_DIR/orbax (the multi-chip path)")
    parser.add_argument("--out-dir", type=str, required=True)
    parser.add_argument("--threads", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--gpu", type=int, default=0, nargs="+",
                        help="-1 forces CPU")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--mesh", type=str, default="",
                        help="SPMD train over a DATAxTP device mesh, e.g. "
                             "'4,2' = batch DP-sharded over 4 devices x FC "
                             "TP-sharded over 2 (the multi-chip replacement "
                             "for the reference's nn.DataParallel); '8' = "
                             "pure DP over 8 devices")
    return parser


def main(argv=None):
    import jax.numpy as jnp

    from .common import setup_device

    args = build_parser().parse_args(argv)
    setup_device(args.gpu)

    from .. import datasets
    from ..train import TrainConfig, fit

    dataset = datasets.create(args.dataset)
    print("Train dataset:", dataset)
    val_dataset = datasets.create(args.val_dataset) if args.val_dataset else None

    cfg = TrainConfig(
        arch=args.arch, out_dim=args.out_dim, loss=args.loss, nq=args.nq,
        margin=args.margin,
        learning_rate=args.lr, lr_schedule=args.lr_schedule,
        lr_decay=args.lr_decay, lr_decay_steps=args.lr_decay_steps,
        warmup_steps=args.warmup_steps,
        crops_per_image=args.crops_per_image,
        weight_decay=args.weight_decay,
        optimizer=args.optimizer, freeze_bn=not args.no_freeze_bn,
        epochs=args.epochs, batch_size=args.batch_size,
        microbatch=args.microbatch, trfs=args.trfs,
        seed=args.seed, threads=args.threads)

    params = None
    if args.checkpoint:
        from ..models import create_model
        from ..utils.checkpoints import load_checkpoint, load_tolerant, \
            params_to_state_dict

        ckpt = load_checkpoint(args.checkpoint)
        model = create_model(cfg.arch, out_dim=cfg.out_dim)
        import jax

        init = model.init(jax.random.PRNGKey(cfg.seed))
        donor_sd = params_to_state_dict(ckpt.params, ckpt.model)
        params = load_tolerant(init, model, donor_sd, delete_fc=args.delete_fc)

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    eval_dataset = (datasets.create(args.eval_dataset)
                    if args.eval_dataset else None)
    mesh = None
    if args.mesh:
        from ..parallel.mesh import make_mesh

        dims = [int(v) for v in args.mesh.split(",")]
        assert len(dims) in (1, 2), "--mesh takes 'data' or 'data,db'"
        mesh = make_mesh(dims[0], dims[1] if len(dims) == 2 else 1)
        print(f"Mesh: data={mesh.shape['data']} x db={mesh.shape['db']}")
    model, params, history = fit(
        dataset, cfg, val_dataset=val_dataset, params=params,
        out_dir=args.out_dir, dtype=dtype, resume=args.resume or None,
        steps_per_epoch=args.steps_per_epoch, progress=True,
        eval_dataset=eval_dataset, eval_trfs=args.eval_trfs, mesh=mesh,
        ckpt_format=args.ckpt_format)
    for h in history:
        line = f"epoch {h['epoch']}: loss {h['loss']:.4f}"
        if "val_loss" in h:
            line += f"  val_loss {h['val_loss']:.4f}"
        for k in ("mAP", "mAP-medium"):
            if k in h:
                line += f"  {k} {h[k]:.4f}"
        print(line)
    return history


if __name__ == "__main__":
    main()
