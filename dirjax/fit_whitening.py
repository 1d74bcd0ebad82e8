"""Alias: ``python -m dirjax.fit_whitening`` (no reference equivalent —
the released checkpoints' PCA was fitted in NAVER-internal code)."""

from .cli.fit_whitening import build_parser, main  # noqa: F401

if __name__ == "__main__":
    main()
