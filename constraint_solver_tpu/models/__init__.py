from constraint_solver_tpu.models.ackley import make_ackley_problem, ackley_np, ackley  # noqa: F401
from constraint_solver_tpu.models.nqueens import make_nqueens_problem  # noqa: F401
from constraint_solver_tpu.models.scheduling import (  # noqa: F401
    ScheduleSpec,
    make_scheduling_problem,
)
from constraint_solver_tpu.models.qap import QAPSpec, make_qap_problem  # noqa: F401
from constraint_solver_tpu.models.diagram_layout import (  # noqa: F401
    DiagramLayoutSpec,
    make_diagram_layout_problem,
)
