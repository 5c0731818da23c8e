from . import limb, modular  # noqa: F401
