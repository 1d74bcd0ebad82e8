"""Feature extraction CLI — parity with ``python -m dirtorch.extract_features``
(reference extract_features.py:82-124): extracts descriptors for a dataset
(and its query db when present) and saves them as ``.npy``. Note the
reference's differing whitenp default here (0.5 vs test_dir's 0.25) is
preserved.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp

import jax.numpy as jnp
import numpy as np

from .common import add_model_args, load_extractor, setup_device


def extract_features(db, extractor, trfs, *, pooling="mean", gemp=3,
                     whiten=None, threads=8, processes=0, batch_size=8,
                     batching="group", output=None, progress=False):
    """Extract + pool + whiten descriptors and save (reference
    extract_features.py:26-68)."""
    from .. import ops
    from ..extraction import extract_image_features

    print("\n>> Extracting features...")
    try:
        query_db = db.get_query_db()
    except NotImplementedError:
        query_db = None

    trfs_list = [trfs] if isinstance(trfs, str) else list(trfs)
    kw = dict(threads=threads, processes=processes, batch_size=batch_size,
              batching=batching, progress=progress)
    bl, ql = [], []
    for chain in trfs_list:
        bl.append(extract_image_features(db, chain, extractor, desc="DB", **kw))
        if query_db is not None:
            ql.append(bl[-1] if db is query_db else extract_image_features(
                query_db, chain, extractor, desc="query", **kw))

    bdescs = np.asarray(ops.pool_descriptors([jnp.asarray(d) for d in bl],
                                             pooling, gemp))
    qdescs = None
    if query_db is not None:
        qdescs = np.asarray(ops.pool_descriptors([jnp.asarray(d) for d in ql],
                                                 pooling, gemp))

    if whiten is not None:
        wkw = {k: v for k, v in whiten.items() if k != "pca"}
        bdescs = np.asarray(ops.apply_whitening(bdescs, whiten["pca"], **wkw))
        if qdescs is not None:
            qdescs = np.asarray(ops.apply_whitening(qdescs, whiten["pca"], **wkw))

    os.makedirs(osp.dirname(osp.abspath(output)), exist_ok=True)
    if query_db is db or query_db is None:
        np.save(output, bdescs)
    else:
        stem, ext = osp.splitext(output)
        np.save(stem + ".qdescs" + ext, qdescs)
        np.save(stem + ".dbdescs" + ext, bdescs)
    print("Features extracted.")
    return bdescs


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Extract features")
    add_model_args(parser, whitenp_default=0.5)
    parser.add_argument("--output", type=str, required=True,
                        help="path to output .npy")
    parser.add_argument("--whiten", type=str, default=None,
                        help="whitening PCA name")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    setup_device(args.gpu)

    from .. import datasets

    dataset = datasets.create(args.dataset)
    print("Dataset:", dataset)

    ckpt, extractor, whiten = load_extractor(args)
    return extract_features(
        dataset, extractor, args.trfs, pooling=args.pooling, gemp=args.gemp,
        whiten=whiten, threads=args.threads, processes=args.processes,
        batch_size=args.batch_size, batching=args.batching,
        output=args.output, progress=True)


if __name__ == "__main__":
    main()
