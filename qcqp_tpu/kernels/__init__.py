from . import onevar, projection  # noqa: F401
