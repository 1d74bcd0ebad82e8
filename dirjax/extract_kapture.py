"""Alias so ``python -m dirjax.extract_kapture`` matches the reference's
``python -m dirtorch.extract_kapture`` invocation."""

from .cli.extract_kapture import (  # noqa: F401
    build_parser,
    extract_kapture_global_features,
    main,
)

if __name__ == "__main__":
    main()
