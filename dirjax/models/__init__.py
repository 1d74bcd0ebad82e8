from .resnet import (  # noqa: F401
    RESNET_CONFIGS,
    RGB_MEANS,
    RGB_STDS,
    ResNetConfig,
    apply_resnet,
    fold_batchnorm,
    init_resnet,
    is_folded,
)
from .rmac import DescriptorConfig, apply_descriptor, init_descriptor  # noqa: F401
from .registry import (  # noqa: F401
    Model,
    create_model,
    model_names,
    model_size,
    register_model,
)
