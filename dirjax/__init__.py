"""dirjax — TPU-native deep image retrieval.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
naver/deep-image-retrieval (``dirtorch``): global-descriptor image retrieval
with ResNet backbones, GeM/MAC descriptor heads, PCA-whitening,
multi-scale/flip TTA extraction, dot-product ranking with
alpha-query-expansion, and the Oxford/Paris (classic + revisited) mAP
protocols — designed TPU-first (NHWC layout, static bucketed shapes, bf16
matmuls, device-mesh sharding) rather than translated from the reference.

Layout:
    dirjax.models    — functional NHWC ResNet backbones + descriptor heads
    dirjax.ops       — numerics: GeM, whitening, AQE, ranking, Pallas kernels
    dirjax.parallel  — mesh construction, sharded extraction & ranking
    dirjax.datasets  — benchmark datasets (Oxford5K/Paris6K/R*) + registry
    dirjax.data      — host-side image loading, buckets, samplers
    dirjax.utils     — evaluation metrics, checkpoint conversion, images
    dirjax.cli       — command-line entry points (test_dir, extract_features)
"""

__version__ = "0.1.0"
