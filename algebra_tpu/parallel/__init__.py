from .mesh import default_mesh  # noqa: F401
