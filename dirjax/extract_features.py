"""Alias so ``python -m dirjax.extract_features`` matches the reference's
``python -m dirtorch.extract_features`` invocation."""

from .cli.extract_features import build_parser, extract_features, main  # noqa: F401

if __name__ == "__main__":
    main()
