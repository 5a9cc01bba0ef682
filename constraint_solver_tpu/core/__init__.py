from constraint_solver_tpu.core.problem import Problem, Neighborhood  # noqa: F401
from constraint_solver_tpu.core.history import TabuRing, EliteArchive  # noqa: F401
from constraint_solver_tpu.core.local_search import LsParams, ls_execute  # noqa: F401
from constraint_solver_tpu.core.ils import (  # noqa: F401
    IlsParams,
    IlsState,
    Solver,
    SolverConfig,
    ils_init,
    ils_round,
)
