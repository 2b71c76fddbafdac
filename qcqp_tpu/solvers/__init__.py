from . import coord_descent, admm  # noqa: F401
