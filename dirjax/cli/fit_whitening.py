"""Fit a checkpoint's PCA-whitening from a dataset's descriptors.

Completes the train-your-own story: the reference's released checkpoints
carry an sklearn PCA fitted on Landmarks-clean descriptors inside the
``.pt`` (reference common.py:221-239 consumes it; the fitting itself
happened in NAVER-internal code). This entry point extracts descriptors
for a (typically training) dataset with a checkpoint, fits the identical
PCA (``dirjax.ops.fit_pca`` reproduces sklearn's SVD + svd_flip exactly),
stores it under ``--name`` in the checkpoint's pca dict, and writes the
checkpoint back — ready for ``test_dir --whiten <name>``.

Example:
    python -m dirjax.fit_whitening --dataset Landmarks_clean \\
        --checkpoint runs/r101/checkpoint.npz --name Landmarks_clean \\
        --out runs/r101/whitened.npz
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    from .common import add_model_args

    parser = argparse.ArgumentParser(
        description="Fit PCA whitening from a dataset and store it in a "
                    "checkpoint")
    # the shared extraction surface (dataset/checkpoint/trfs/pooling/
    # batching/device flags) — keep in lockstep with test_dir
    add_model_args(parser, whitenp_default=0.25)
    parser.add_argument("--name", type=str, default="Landmarks_clean",
                        help="key under which the PCA is stored "
                             "(test_dir --whiten <name>)")
    parser.add_argument("--out", type=str, required=True,
                        help="output checkpoint (.npz native, .pt torch)")
    parser.add_argument("--max-images", type=int, default=0,
                        help="fit on at most this many images (0 = all)")
    parser.add_argument("--device-fit", action="store_true",
                        help="fit via streamed on-device covariance + host "
                             "eigh (ops.fit_pca_device) instead of host SVD "
                             "— for corpora where the (N, D) host matrix or "
                             "the O(N D^2) SVD is impractical")
    return parser


def main(argv=None):
    from .common import load_extractor, setup_device

    args = build_parser().parse_args(argv)
    setup_device(args.gpu)

    from .. import datasets, ops
    from ..extraction import extract_image_features
    from ..utils.checkpoints import save_native, save_torch_checkpoint

    dataset = datasets.create(args.dataset)
    print("Whitening dataset:", dataset)
    if args.max_images and len(dataset) > args.max_images:
        from ..datasets.combinators import SubDataset

        step = max(1, len(dataset) // args.max_images)
        dataset = SubDataset(dataset,
                             list(range(0, len(dataset), step))[: args.max_images])

    ckpt, extractor, _ = load_extractor(args)

    trfs_list = [args.trfs] if isinstance(args.trfs, str) else list(args.trfs)
    chains = [extract_image_features(
        dataset, chain, extractor, batching=args.batching,
        batch_size=args.batch_size, threads=args.threads,
        processes=args.processes,
        desc=f"whiten[{chain or 'id'}]", progress=True)
        for chain in trfs_list]
    descs = np.asarray(ops.pool_descriptors(
        [jnp.asarray(d) for d in chains], args.pooling, args.gemp))

    print(f">> Fitting PCA on {descs.shape} descriptors...")
    if args.device_fit:
        ckpt.pca[args.name] = ops.fit_pca_device(jnp.asarray(descs))
    else:
        ckpt.pca[args.name] = ops.fit_pca(descs)

    if args.out.endswith(".pt"):
        save_torch_checkpoint(args.out, ckpt)
    else:
        save_native(args.out, ckpt)
    print(f"saved {args.out} (pca keys: {sorted(ckpt.pca)})")
    return ckpt


if __name__ == "__main__":
    main()
