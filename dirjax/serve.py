"""Alias: ``python -m dirjax.serve`` — serve a built index over a Unix
socket with dynamic batching (beyond-reference serving surface; see
:mod:`dirjax.server`)."""

from .server import main  # noqa: F401

if __name__ == "__main__":
    main()
