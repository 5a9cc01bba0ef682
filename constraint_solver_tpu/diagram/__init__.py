from constraint_solver_tpu.diagram.geometry import (  # noqa: F401
    Diagram,
    GeomBox,
    OrthogonalVisibilityGraph,
    Padding,
    Ports,
    interesting_horizontal_segments,
    interesting_vertical_segments,
    render_svg,
)
from constraint_solver_tpu.diagram.route import (  # noqa: F401
    render_routed,
    route_connectors,
)
from constraint_solver_tpu.diagram.png import (  # noqa: F401
    render_png,
    render_routed_png,
)
