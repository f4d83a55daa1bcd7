from . import ofd  # noqa: F401
