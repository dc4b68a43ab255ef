from .jit import jit_method  # noqa: F401
