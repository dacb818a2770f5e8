from okvis2x_tpu.solver.problem import (  # noqa: F401
    BAProblem,
    empty_problem,
    free_mask,
    apply_delta,
)
from okvis2x_tpu.solver.gauss_newton import (  # noqa: F401
    SolverConfig,
    StackedCameras,
    stack_cameras,
    linearize,
    compute_cost,
    solve_normal_equations,
    optimize,
)
