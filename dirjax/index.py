"""Alias: ``python -m dirjax.index`` — build/query a serving index from
the ``.npy`` descriptor files ``python -m dirjax.extract_features``
writes (beyond-reference serving surface)."""

from .cli.index import build_parser, main  # noqa: F401

if __name__ == "__main__":
    main()
