from .restarts import (  # noqa: F401
    make_mesh, best_point, suggest_batch, improve_chain, solve_restarts,
)
from .mesh import admm_phase1_sharded  # noqa: F401
