from . import nbtheory  # noqa: F401
