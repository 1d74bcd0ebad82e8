"""Checkpoint I/O: PyTorch ``.pt`` interop + a native npz format.

The reference's released checkpoints (Resnet101-AP-GeM.pt, ...) are torch
pickles with the schema (reference ``test_dir.py:183-191``,
``utils/common.py:102-147``):

    {'state_dict':    {torch param name: tensor},
     'model_options': {'arch': ..., **model kwargs},
     'preprocess':    {'mean': ..., 'std': ..., 'input_size': ...},
     'pca':           {whitening dataset name: sklearn PCA object},
     # training checkpoints also: 'epoch', 'optimizer', ...}

:func:`load_torch_checkpoint` converts that into a :class:`Checkpoint` of
JAX pytrees: conv weights OIHW->HWIO, fc weights (out,in)->(in,out), BN
running stats, GeM's learnable p, and each sklearn PCA reduced to plain
arrays (:class:`~dirjax.ops.whitening.PCAParams`). torch is imported lazily
and only used as an unpickler — nothing at runtime depends on it.

:func:`save_native` / :func:`load_native` round-trip the same content
through a single ``.npz`` (flattened pytree + JSON metadata), the format
used for our own training checkpoints.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict

import numpy as np

from ..models import Model, create_model
from ..ops.whitening import PCAParams

__all__ = [
    "Checkpoint", "load_checkpoint", "load_torch_checkpoint",
    "convert_state_dict", "params_to_state_dict", "save_native", "load_native",
]


@dataclass
class Checkpoint:
    model: Model
    params: Dict[str, Any]
    preprocess: dict
    pca: Dict[str, PCAParams] = field(default_factory=dict)
    extra: dict = field(default_factory=dict)  # epoch, optimizer state, ...


# --------------------------------------------------------------------------
# torch name mapping
# --------------------------------------------------------------------------

def _bn_from_torch(sd, prefix) -> Dict[str, np.ndarray]:
    return {
        "scale": np.asarray(sd[prefix + ".weight"], dtype=np.float32),
        "bias": np.asarray(sd[prefix + ".bias"], dtype=np.float32),
        "mean": np.asarray(sd[prefix + ".running_mean"], dtype=np.float32),
        "var": np.asarray(sd[prefix + ".running_var"], dtype=np.float32),
    }


def _conv_from_torch(sd, name) -> np.ndarray:
    # torch OIHW -> NHWC-conv HWIO
    return np.asarray(sd[name], dtype=np.float32).transpose(2, 3, 1, 0)


def convert_state_dict(state_dict: Dict[str, Any], model: Model) -> Dict[str, Any]:
    """Map a reference torch state_dict onto our parameter pytree."""
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in state_dict.items()}
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in sd.items() if not k.endswith("num_batches_tracked")}

    cfg = model.config
    backbone: Dict[str, Any] = {
        "stem": {"conv": _conv_from_torch(sd, "conv1.weight"),
                 "bn": _bn_from_torch(sd, "bn1")},
    }
    for s, nblocks in enumerate(cfg.backbone.layers):
        blocks = []
        for b in range(nblocks):
            pre = f"layer{s + 1}.{b}"
            block = {}
            nconv = 2 if cfg.backbone.block == "basic" else 3
            for c in range(1, nconv + 1):
                block[f"conv{c}"] = _conv_from_torch(sd, f"{pre}.conv{c}.weight")
                block[f"bn{c}"] = _bn_from_torch(sd, f"{pre}.bn{c}")
            if f"{pre}.downsample.0.weight" in sd:
                block["downsample"] = {
                    "conv": _conv_from_torch(sd, f"{pre}.downsample.0.weight"),
                    "bn": _bn_from_torch(sd, f"{pre}.downsample.1"),
                }
            blocks.append(block)
        backbone[f"layer{s + 1}"] = blocks

    params: Dict[str, Any] = {"backbone": backbone}

    if cfg.fpn_mode is not None:
        if cfg.fpn_mode == 1:
            params["conv1x5"] = _conv_from_torch(sd, "conv1x5.weight")
            params["conv3c4"] = _conv_from_torch(sd, "conv3c4.weight")
        if cfg.pooling == "gem":
            params["pool_p_x5"] = np.float32(np.asarray(sd["adpoolx5.p"]).reshape(()))
            params["pool_p_c4"] = np.float32(np.asarray(sd["adpoolc4.p"]).reshape(()))
    elif cfg.pooling.startswith("gem") and "adpool.p" in sd:
        params["pool_p"] = np.float32(np.asarray(sd["adpool.p"]).reshape(()))

    if not cfg.without_fc:
        params["fc"] = {
            "kernel": np.asarray(sd["fc.weight"], dtype=np.float32).T,
            "bias": np.asarray(sd["fc.bias"], dtype=np.float32),
        }
    return params


def params_to_state_dict(params: Dict[str, Any], model: Model) -> Dict[str, np.ndarray]:
    """Inverse mapping (ours -> torch names), for exporting checkpoints the
    reference toolbox can read."""
    cfg = model.config
    sd: Dict[str, np.ndarray] = {}

    def put_bn(prefix, bn):
        sd[prefix + ".weight"] = np.asarray(bn["scale"])
        sd[prefix + ".bias"] = np.asarray(bn["bias"])
        sd[prefix + ".running_mean"] = np.asarray(bn["mean"])
        sd[prefix + ".running_var"] = np.asarray(bn["var"])

    bb = params["backbone"]
    sd["conv1.weight"] = np.asarray(bb["stem"]["conv"]).transpose(3, 2, 0, 1)
    put_bn("bn1", bb["stem"]["bn"])
    for s, nblocks in enumerate(cfg.backbone.layers):
        for b in range(nblocks):
            pre = f"layer{s + 1}.{b}"
            block = bb[f"layer{s + 1}"][b]
            nconv = 2 if cfg.backbone.block == "basic" else 3
            for c in range(1, nconv + 1):
                sd[f"{pre}.conv{c}.weight"] = np.asarray(
                    block[f"conv{c}"]).transpose(3, 2, 0, 1)
                put_bn(f"{pre}.bn{c}", block[f"bn{c}"])
            if "downsample" in block:
                sd[f"{pre}.downsample.0.weight"] = np.asarray(
                    block["downsample"]["conv"]).transpose(3, 2, 0, 1)
                put_bn(f"{pre}.downsample.1", block["downsample"]["bn"])

    if "pool_p" in params:
        sd["adpool.p"] = np.asarray(params["pool_p"]).reshape(1)
    if "pool_p_x5" in params:
        sd["adpoolx5.p"] = np.asarray(params["pool_p_x5"]).reshape(1)
        sd["adpoolc4.p"] = np.asarray(params["pool_p_c4"]).reshape(1)
    if "conv1x5" in params:
        sd["conv1x5.weight"] = np.asarray(params["conv1x5"]).transpose(3, 2, 0, 1)
        sd["conv3c4.weight"] = np.asarray(params["conv3c4"]).transpose(3, 2, 0, 1)
    if "fc" in params:
        sd["fc.weight"] = np.asarray(params["fc"]["kernel"]).T
        sd["fc.bias"] = np.asarray(params["fc"]["bias"])
    return sd


def load_tolerant(init_params: Dict[str, Any], model: Model,
                  state_dict: Dict[str, Any], delete_fc: bool = False,
                  verbose: bool = True) -> Dict[str, Any]:
    """Tolerant weight loading (reference ``nets/__init__.py:67-96``):
    start from freshly initialized params, overlay every state_dict entry
    whose name and shape match, keep the init values for missing layers and
    shape mismatches (reporting both), and optionally keep the fresh FC
    (``delete_fc`` — used when fine-tuning to a new output dim)."""
    target = params_to_state_dict(init_params, model)
    incoming = {k[7:] if k.startswith("module.") else k: v
                for k, v in state_dict.items()}
    incoming = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
                for k, v in incoming.items()
                if not k.endswith("num_batches_tracked")}

    merged = {}
    for name, init_val in target.items():
        if delete_fc and name in ("fc.weight", "fc.bias"):
            merged[name] = init_val
            continue
        if name not in incoming:
            if verbose:
                print(f"Loading weights for {model.arch}: Missing layer {name}")
            merged[name] = init_val
        elif tuple(incoming[name].shape) != tuple(init_val.shape):
            if verbose:
                print(f"Loading weights for {model.arch}: Bad shape for "
                      f"layer {name}, skipping")
            merged[name] = init_val
        else:
            merged[name] = incoming[name]
    return convert_state_dict(merged, model)


def _pca_from_object(pca) -> PCAParams:
    """Reduce an unpickled sklearn PCA (or a plain dict) to arrays."""
    if isinstance(pca, PCAParams):
        return pca
    if isinstance(pca, dict):
        return PCAParams(mean=np.asarray(pca["mean"]),
                         components=np.asarray(pca["components"]),
                         variance=np.asarray(pca["variance"]),
                         whiten=bool(pca.get("whiten", True)))
    return PCAParams.from_sklearn(pca)


def load_torch_checkpoint(path: str) -> Checkpoint:
    """Read a reference ``.pt`` checkpoint and convert everything to JAX."""
    import torch

    assert os.path.isfile(path), f"=> no checkpoint found at '{path}'"
    ckpt = torch.load(path, map_location="cpu", weights_only=False)

    options = dict(ckpt["model_options"])
    arch = options.pop("arch")
    model = create_model(arch, **options)
    params = convert_state_dict(ckpt["state_dict"], model)
    preprocess = ckpt.get("preprocess", model.preprocess)
    pca = {name: _pca_from_object(p) for name, p in ckpt.get("pca", {}).items()}
    extra = {k: ckpt[k] for k in ("epoch", "iter", "current_iter") if k in ckpt}
    return Checkpoint(model=model, params=params, preprocess=preprocess,
                      pca=pca, extra=extra)


# --------------------------------------------------------------------------
# native npz format
# --------------------------------------------------------------------------

def _flatten(tree, prefix="", out=None):
    out = {} if out is None else out
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(v, f"{prefix}{k}/", out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten(v, f"{prefix}{i}/", out)
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    root: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        # only a CONTIGUOUS 0..n-1 digit range is a saved list; a lone
        # numeric name (e.g. a pca entry called "123") must stay a dict
        if keys and all(k.isdigit() for k in keys) and \
                sorted(int(k) for k in keys) == list(range(len(keys))):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_native(path: str, ckpt: Checkpoint) -> None:
    """Write a Checkpoint as one .npz: params + pca arrays + JSON meta."""
    arrays = _flatten(ckpt.params, "params/")
    for name, pca in ckpt.pca.items():
        arrays[f"pca/{name}/mean"] = np.asarray(pca.mean)
        arrays[f"pca/{name}/components"] = np.asarray(pca.components)
        arrays[f"pca/{name}/variance"] = np.asarray(pca.variance)
        arrays[f"pca/{name}/whiten"] = np.asarray(bool(pca.whiten))
    meta = {
        "arch": ckpt.model.arch,
        "model_options": _config_options(ckpt.model),
        "preprocess": ckpt.preprocess,
        "extra": {k: v for k, v in ckpt.extra.items()
                  if isinstance(v, (int, float, str))},
    }
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def _config_options(model: Model) -> dict:
    cfg = model.config
    return {
        "out_dim": cfg.out_dim, "pooling": cfg.pooling, "gemp": cfg.gemp,
        "center_bias": cfg.center_bias, "norm_features": cfg.norm_features,
        "without_fc": cfg.without_fc, "dropout_p": cfg.dropout_p,
    }


def load_native(path: str) -> Checkpoint:
    with np.load(path, allow_pickle=False) as data:
        arrays = {k: data[k] for k in data.files}
    meta = json.loads(bytes(arrays.pop("__meta__")).decode())
    params_flat = {k[len("params/"):]: v for k, v in arrays.items()
                   if k.startswith("params/")}
    params = _unflatten(params_flat)
    # parse pca entries WITHOUT _unflatten's list detection: a whitening
    # dataset named "0"/"123" must stay a dict key, never a list index
    pca_fields: Dict[str, dict] = {}
    for k, v in arrays.items():
        if k.startswith("pca/"):
            name, field = k[len("pca/"):].rsplit("/", 1)
            pca_fields.setdefault(name, {})[field] = v
    pca = {name: PCAParams(mean=v["mean"], components=v["components"],
                           variance=v["variance"],
                           whiten=bool(v.get("whiten", True)))
           for name, v in pca_fields.items()}
    model = create_model(meta["arch"], **{k: v for k, v in
                                          meta["model_options"].items()})
    return Checkpoint(model=model, params=params,
                      preprocess=meta["preprocess"], pca=pca,
                      extra=meta.get("extra", {}))


def load_checkpoint(path: str) -> Checkpoint:
    """Load either format: native ``.npz`` or reference torch ``.pt``.

    Dispatch sniffs the content (both formats are zip archives, and names
    like ``checkpoint.npz.best`` defeat extension checks): a native archive
    always carries the ``__meta__`` member."""
    try:
        with np.load(path, allow_pickle=False) as data:
            is_native = "__meta__" in data.files
    except Exception:
        is_native = False
    return load_native(path) if is_native else load_torch_checkpoint(path)


def save_torch_checkpoint(path: str, ckpt: Checkpoint) -> None:
    """Export a Checkpoint in the reference's ``.pt`` schema so the original
    dirtorch toolbox can consume models trained here (the inverse of
    :func:`load_torch_checkpoint`). PCA arrays are stored as plain dicts
    readable by ``common.transform(use_sklearn=False)``-style consumers and
    by our loader."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in params_to_state_dict(ckpt.params, ckpt.model).items()}
    payload = {
        "state_dict": sd,
        "model_options": {"arch": ckpt.model.arch,
                          **_config_options(ckpt.model)},
        "preprocess": ckpt.preprocess,
        "pca": {name: {"mean": np.asarray(p.mean),
                       "components": np.asarray(p.components),
                       "variance": np.asarray(p.variance),
                       "whiten": bool(p.whiten)}
                for name, p in ckpt.pca.items()},
        **{k: v for k, v in ckpt.extra.items()
           if isinstance(v, (int, float, str))},
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save(payload, path)
