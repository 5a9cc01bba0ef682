from constraint_solver_tpu.serve.server import SolverService, run_server  # noqa: F401
