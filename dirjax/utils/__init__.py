from . import evaluation  # noqa: F401
from .timer import tic, toc  # noqa: F401
