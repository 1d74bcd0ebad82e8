"""Shared CLI plumbing: device selection, checkpoint loading, whitening args.

Mirrors the reference's entry-point boilerplate (``test_dir.py:194-243``,
``extract_features.py:82-121``) on JAX: ``--gpu -1`` forces the CPU backend
(the reference's CPU mode, common.py:64), any other value keeps the default
accelerator; ``--bf16`` switches the conv compute dtype.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def add_model_args(parser: argparse.ArgumentParser, whitenp_default: float):
    parser.add_argument("--dataset", "-d", type=str, required=True,
                        help="dataset spec, e.g. RParis6K or ImageList('l.txt')")
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="path to weights (.pt reference or .npz native)")
    parser.add_argument("--trfs", type=str, default="", nargs="+",
                        help="test transform chains (can be several)")
    parser.add_argument("--pooling", type=str, default="gem",
                        help="pooling scheme if several trf chains")
    parser.add_argument("--gemp", type=int, default=3, help="GeM pooling power")
    parser.add_argument("--threads", type=int, default=8,
                        help="number of loader threads")
    parser.add_argument("--processes", type=int, default=0,
                        help="decode in N worker processes (multi-core "
                             "hosts; 0 = threads only)")
    parser.add_argument("--batch-size", type=int, default=8,
                        help="extraction batch size")
    parser.add_argument("--batching", type=str, default="group",
                        choices=("group", "bucket", "single"),
                        help="batch formation: exact same-shape groups, "
                             "padded+masked buckets, or one-by-one")
    parser.add_argument("--gpu", type=int, default=0, nargs="+",
                        help="device ids; -1 forces CPU")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 conv compute (fast path)")
    parser.add_argument("--dbg", default=(), nargs="*", help="debugging options")
    parser.add_argument("--profile", type=str, default="",
                        help="write a jax.profiler (Perfetto/XPlane) trace "
                             "of the run to this directory")
    parser.add_argument("--whitenp", type=float, default=whitenp_default,
                        help="whitening power")
    parser.add_argument("--whitenv", type=int, default=None,
                        help="number of whitening components")
    parser.add_argument("--whitenm", type=float, default=1.0,
                        help="whitening multiplier")


from contextlib import nullcontext


def maybe_profile(profile_dir: str):
    """jax.profiler trace scope (the TPU-native replacement for the
    reference's tic/toc-only observability, SURVEY.md §5)."""
    if not profile_dir:
        return nullcontext()
    import jax.profiler

    return jax.profiler.trace(profile_dir)


def setup_device(gpu) -> bool:
    """-1 -> CPU; returns True when running on an accelerator."""
    gpus = gpu if isinstance(gpu, (list, tuple)) else [gpu]
    if any(g < 0 for g in gpus):
        jax.config.update("jax_platforms", "cpu")
        print("Launching on >> CPU <<")
        return False
    backend = jax.default_backend()
    print(f"Launching on {backend} ({jax.device_count()} device(s))")
    return backend != "cpu"


def load_extractor(args):
    """Load checkpoint -> (Checkpoint, FeatureExtractor, whiten-dict|None)."""
    from ..extraction import FeatureExtractor
    from ..utils.checkpoints import load_checkpoint

    ckpt = load_checkpoint(args.checkpoint)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    precision = None if args.bf16 else jax.lax.Precision.HIGHEST
    # the checkpoint's own mean/std (test_dir.py:183-191), not the arch's
    extractor = FeatureExtractor(ckpt.model, ckpt.params, dtype=dtype,
                                 precision=precision,
                                 preprocess=ckpt.preprocess)

    whiten = None
    whiten_name = getattr(args, "whiten", None)
    if whiten_name:
        if whiten_name not in ckpt.pca:
            raise KeyError(
                f"checkpoint has no whitening for {whiten_name!r}; available: "
                f"{sorted(ckpt.pca)}")
        whiten = {"pca": ckpt.pca[whiten_name], "whitenp": args.whitenp,
                  "whitenv": args.whitenv, "whitenm": args.whitenm}
    return ckpt, extractor, whiten
