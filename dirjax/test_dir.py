"""Alias so ``python -m dirjax.test_dir`` matches the reference's
``python -m dirtorch.test_dir`` invocation."""

from .cli.test_dir import build_parser, main  # noqa: F401
from .extraction import eval_model, extract_image_features  # noqa: F401

if __name__ == "__main__":
    main()
