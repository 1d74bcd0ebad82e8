"""Model registry and factory.

Parity with reference ``dirtorch/nets/__init__.py:11-64``: string arch names
(resnet18/50/101/152_rmac, *_fpn_rmac, resnet101_fpn0_rmac) resolved through
an explicit registry; ``create_model`` returns a :class:`Model` bundle of
(config, init, apply, preprocess) rather than a stateful module.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict

from .resnet import RESNET_CONFIGS
from .rmac import DescriptorConfig, apply_descriptor, init_descriptor

__all__ = ["Model", "create_model", "model_names", "model_size", "register_model"]

_FACTORIES: Dict[str, Callable[..., DescriptorConfig]] = {}


@dataclass(frozen=True)
class Model:
    """A descriptor model: static config + pure init/apply functions."""

    arch: str
    config: DescriptorConfig

    def init(self, key):
        return init_descriptor(key, self.config)

    def apply(self, params, images, **kw):
        return apply_descriptor(params, images, self.config, **kw)

    @property
    def preprocess(self) -> dict:
        return self.config.preprocess

    @property
    def feat_dim(self) -> int:
        return self.config.feat_dim


def model_size(params) -> int:
    """Total number of parameters in a pytree (reference
    ``utils/common.py:178-184``)."""
    import jax
    import numpy as np

    return int(sum(np.prod(np.shape(leaf)) for leaf in jax.tree.leaves(params)))


def register_model(name: str, factory: Callable[..., DescriptorConfig]):
    _FACTORIES[name] = factory


def model_names() -> list:
    return sorted(_FACTORIES)


def _rmac_config(backbone: str, fpn_mode=None, *, out_dim=None, norm_features=False,
                 pooling="gem", gemp=3, center_bias=0, dropout_p=None,
                 without_fc=False, **_ignored) -> DescriptorConfig:
    bb = RESNET_CONFIGS[backbone]
    if out_dim is None:
        # FPN default out_dim = dim1+dim2 (rmac_resnet_fpn.py:26); plain: 2048
        out_dim = (bb.c4_channels + bb.out_channels) if fpn_mode is not None else 2048
    return DescriptorConfig(
        backbone=bb, out_dim=out_dim, pooling=pooling, gemp=gemp,
        center_bias=center_bias, norm_features=norm_features,
        without_fc=without_fc, dropout_p=dropout_p, fpn_mode=fpn_mode)


for _bb in ("resnet18", "resnet50", "resnet101", "resnet152"):
    register_model(f"{_bb}_rmac", partial(_rmac_config, _bb, None))
    register_model(f"{_bb}_fpn_rmac", partial(_rmac_config, _bb, 1))
register_model("resnet101_fpn0_rmac", partial(_rmac_config, "resnet101", 0))
# working ResNeXt head (the reference's rmac_resnext.py is dead/broken,
# SURVEY.md §2); same R-MAC head over the grouped-conv backbone
register_model("resnext101_32x4d_rmac",
               partial(_rmac_config, "resnext101_32x4d", None))


def create_model(arch: str, pretrained: str = "", **kwargs) -> Model:
    """Build a Model by architecture name. ``kwargs`` mirror the reference's
    checkpoint ``model_options`` (out_dim, pooling, gemp, without_fc, ...);
    unknown keys are ignored like the reference's **kwargs plumbing."""
    if arch not in _FACTORIES:
        raise NameError(
            f"unknown model architecture '{arch}'. Select one of: "
            + ", ".join(model_names()))
    cfg = _FACTORIES[arch](**kwargs)
    model = Model(arch=arch, config=cfg)
    if pretrained:
        raise NotImplementedError(
            "use dirjax.utils.checkpoints.load_checkpoint to load weights")
    return model
