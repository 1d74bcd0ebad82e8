from . import geometry, transforms  # noqa: F401
from .loader import (  # noqa: F401
    BalancedSampler,
    Batch,
    SampleLoader,
    array2img,
    get_loader,
    iterate_batches,
    load_one_img,
    test_loader_speed,
)
