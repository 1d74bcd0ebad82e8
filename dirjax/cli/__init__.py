"""Command-line entry points (reference parity):

    python -m dirjax.test_dir          — benchmark evaluation
    python -m dirjax.extract_features  — descriptor extraction to .npy
    python -m dirjax.extract_kapture   — kapture global features
    python -m dirjax.models            — list available architectures
    python -m dirjax.datasets          — inspect a dataset
"""
