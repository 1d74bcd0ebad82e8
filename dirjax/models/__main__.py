"""List available architectures (reference ``python -m dirtorch.nets``)."""

import os

if os.environ.get("JAX_PLATFORMS"):
    # honor an explicit platform request: the env var alone does not
    # override a pre-registered accelerator plugin (see CLAUDE.md), and
    # listing model names must not block on claiming a busy accelerator
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from . import model_names

if __name__ == "__main__":
    print("Available architectures:")
    for name in model_names():
        print("  " + name)
