"""Minimal torchvision.transforms stand-in for cross-toolbox tests.

The sandbox ships torch but not torchvision; the reference's transform
stack only touches four of its symbols (``Compose``, ``Lambda``,
``ToTensor``, ``Normalize`` — reference ``utils/transforms.py``). This shim
re-implements those public torchvision semantics (PIL -> CHW float/255,
per-channel standardization) so the reference pipeline can run for parity
testing. Call :func:`install` before importing any ``dirtorch`` module.
"""

import sys
import types

import numpy as np
import torch


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class Lambda:
    def __init__(self, fn):
        self.fn = fn

    def __call__(self, x):
        return self.fn(x)


class ToTensor:
    def __call__(self, pic):
        arr = np.asarray(pic, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(arr.copy()).permute(2, 0, 1).contiguous()
        return t.float().div(255.0)


class Normalize:
    def __init__(self, mean, std, inplace=False):
        self.mean = mean
        self.std = std

    def __call__(self, t):
        mean = torch.as_tensor(self.mean, dtype=t.dtype).view(-1, 1, 1)
        std = torch.as_tensor(self.std, dtype=t.dtype).view(-1, 1, 1)
        return (t - mean) / std


def install() -> None:
    """Register fake ``torchvision``/``torchvision.transforms`` modules
    (no-op when the real package is importable)."""
    try:
        import torchvision.transforms  # noqa: F401
        return
    except ImportError:
        pass
    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    for cls in (Compose, Lambda, ToTensor, Normalize):
        setattr(tr, cls.__name__, cls)
    tv.transforms = tr
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tr)
