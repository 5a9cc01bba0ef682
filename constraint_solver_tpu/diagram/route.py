"""Orthogonal connector routing on the visibility graph.

The reference builds the orthogonal visibility graph (reference
examples/diagram/src/lib.rs:620-705, after Wybrow/Marriott/Stuckey 2009) but
stops there — no router, and its solver hookup is empty structs
(main.rs:7-9).  This module finishes the pipeline:

    TPU solve (models/diagram_layout.py)  →  grid layout
    C++ sweep (native/diagram.cc)         →  visibility graph
    Dijkstra here                         →  orthogonal connector routes
    render_routed                         →  SVG

Routing is host-side graph search over the irregular sparse graph — exactly
the kind of data structure that stays off the TPU (docs/DESIGN.md); the TPU
owns the dense layout optimization, the host owns the final geometry pass.

Each connector is routed vertex-nearest-to-center → vertex-nearest-to-center
with edge weight = Manhattan length + a fixed per-bend penalty (prefers
straighter routes, the visual objective of the reference's source papers).
"""

from __future__ import annotations

import heapq
from collections import defaultdict

from constraint_solver_tpu.diagram.geometry import (
    Diagram,
    OrthogonalVisibilityGraph,
)

BEND_PENALTY = 10.0


def _build_adjacency(graph: OrthogonalVisibilityGraph):
    adj = defaultdict(list)
    for (a, b) in graph.edges:
        w = abs(a[0] - b[0]) + abs(a[1] - b[1])
        adj[a].append((b, w))
        adj[b].append((a, w))
    return adj


def _nearest_vertex(vertices, point):
    return min(
        vertices,
        key=lambda v: (v[0] - point[0]) ** 2 + (v[1] - point[1]) ** 2,
    )


def _direction(a, b):
    return (
        (b[0] > a[0]) - (b[0] < a[0]),
        (b[1] > a[1]) - (b[1] < a[1]),
    )


def shortest_route(adj, src, dst, bend_penalty: float = BEND_PENALTY):
    """Dijkstra with bend-aware state (vertex, incoming direction).

    Returns the vertex list src..dst, or None if disconnected.
    """
    # state: (vertex, incoming direction); direction None at the source.
    # The heap carries a monotone counter so ties never compare states
    # (direction can be None, which is unorderable against tuples).
    best = {}
    prev = {}
    counter = 0
    heap = [(0.0, counter, src, None)]
    while heap:
        cost, _, v, d = heapq.heappop(heap)
        key = (v, d)
        if key in best and best[key] < cost:
            continue
        if v == dst:
            # Reconstruct.
            path = [v]
            k = key
            while k in prev:
                k = prev[k]
                path.append(k[0])
            return list(reversed(path))
        for (w, length) in adj.get(v, ()):  # noqa: B023
            nd = _direction(v, w)
            ncost = cost + length
            if d is not None and nd != d:
                ncost += bend_penalty
            nkey = (w, nd)
            if nkey not in best or ncost < best[nkey]:
                best[nkey] = ncost
                prev[nkey] = key
                counter += 1
                heapq.heappush(heap, (ncost, counter, w, nd))
    return None


def _components(adj):
    """Connected components of the visibility graph (list of vertex lists)."""
    seen = set()
    comps = []
    for start in adj:
        if start in seen:
            continue
        comp = []
        stack = [start]
        seen.add(start)
        while stack:
            v = stack.pop()
            comp.append(v)
            for (w, _) in adj[v]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        comps.append(comp)
    return comps


def fallback_elbow(boxes, i, j):
    """Center-to-center L-shaped elbow for connectors the graph can't carry
    (shared by the SVG and PNG renderers so the two outputs never diverge)."""
    x1, y1, x2, y2 = boxes[i].rect
    a = ((x1 + x2) / 2.0, (y1 + y2) / 2.0)
    x1, y1, x2, y2 = boxes[j].rect
    b = ((x1 + x2) / 2.0, (y1 + y2) / 2.0)
    return [a, (b[0], a[1]), b]


def route_connectors(boxes, edges, bend_penalty: float = BEND_PENALTY):
    """Route each (i, j) connector between boxes on the visibility graph.

    ``boxes`` is a GeomBox list, ``edges`` index pairs into it.  Returns a
    list of vertex paths (None where the graph has no usable component).

    The visibility graph inherited from the reference's edge semantics is
    fragmented — one large component plus isolated port-pair fragments — so
    endpoints are chosen per connector as the (src, dst) pair **within one
    component** minimizing the summed distance to the two box centers;
    Dijkstra then always succeeds within that component.
    """
    diagram = Diagram(boxes)
    graph = OrthogonalVisibilityGraph(diagram)
    adj = _build_adjacency(graph)
    if not adj:
        return [None for _ in edges]
    comps = _components(adj)

    def center(b):
        x1, y1, x2, y2 = b.rect
        return ((x1 + x2) / 2.0, (y1 + y2) / 2.0)

    def d2(v, p):
        return (v[0] - p[0]) ** 2 + (v[1] - p[1]) ** 2

    routes = []
    for (i, j) in edges:
        ci, cj = center(boxes[i]), center(boxes[j])
        best = None  # (cost, src, dst)
        for comp in comps:
            if len(comp) < 2:
                continue
            src = min(comp, key=lambda v: d2(v, ci))
            dst = min(comp, key=lambda v: d2(v, cj))
            cost = d2(src, ci) ** 0.5 + d2(dst, cj) ** 0.5
            if best is None or cost < best[0]:
                best = (cost, src, dst)
        if best is None:
            routes.append(None)
            continue
        routes.append(shortest_route(adj, best[1], best[2], bend_penalty))
    return routes


def render_routed(boxes, edges, path: str | None = None) -> str:
    """SVG of boxes plus routed orthogonal connectors (the finished form of
    the reference's render demo, main.rs:11-236)."""
    routes = route_connectors(boxes, edges)
    xs, ys = [], []
    for b in boxes:
        x1, y1, x2, y2 = b.rect
        xs += [x1, x2]
        ys += [y1, y2]
    pad = 30.0
    min_x, max_x = min(xs) - pad, max(xs) + pad
    min_y, max_y = min(ys) - pad, max(ys) + pad
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" '
        f'viewBox="{min_x} {min_y} {max_x - min_x} {max_y - min_y}">',
        f'<rect x="{min_x}" y="{min_y}" width="{max_x - min_x}" '
        f'height="{max_y - min_y}" fill="white"/>',
    ]
    for route, (i, j) in zip(routes, edges):
        if route is None:
            # No usable component: fall back to an L-shaped center-to-center
            # elbow so the connector stays orthogonal and visible.
            route = fallback_elbow(boxes, i, j)
        pts = " ".join(f"{x},{y}" for x, y in route)
        parts.append(
            f'<polyline points="{pts}" fill="none" '
            'stroke="#188038" stroke-width="2"/>'
        )
    for b in boxes:
        x1, y1, x2, y2 = b.rect
        parts.append(
            f'<rect x="{min(x1, x2)}" y="{min(y1, y2)}" '
            f'width="{abs(x2 - x1)}" height="{abs(y2 - y1)}" '
            'fill="#e8f0fe" stroke="#1a73e8" stroke-width="1.5"/>'
        )
    parts.append("</svg>")
    svg = "\n".join(parts)
    if path:
        with open(path, "w") as f:
            f.write(svg)
    return svg
