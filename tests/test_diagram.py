"""Diagram geometry tests — golden fixtures from the reference
(examples/diagram/src/lib.rs:830-908) plus property tests."""

import random

import pytest

from constraint_solver_tpu.diagram import (
    Diagram,
    GeomBox,
    OrthogonalVisibilityGraph,
    Padding,
    Ports,
    interesting_horizontal_segments,
    interesting_vertical_segments,
    render_svg,
)


def _two_box_diagram():
    """The golden two-box fixture (ref lib.rs:833-844)."""
    return Diagram([
        GeomBox(rect=(100.0, 100.0, 200.0, 200.0),
                padding=Padding.uniform(10.0), ports=Ports(1, 1, 0, 0)),
        GeomBox(rect=(300.0, 100.0, 400.0, 200.0),
                padding=Padding.uniform(10.0), ports=Ports(0, 0, 0, 1)),
    ])


def test_golden_horizontal_segments():
    """Exact expected list (ref lib.rs:850-866), in sweep emission order."""
    segs = interesting_horizontal_segments(_two_box_diagram())
    assert segs == [
        ((90.0, 90.0), (410.0, 90.0)),
        ((210.0, 90.0), (410.0, 90.0)),
        ((200.0, 150.0), (290.0, 150.0)),
        ((210.0, 150.0), (300.0, 150.0)),
        ((90.0, 210.0), (290.0, 210.0)),
        ((90.0, 210.0), (410.0, 210.0)),
    ]


def test_golden_vertical_segments():
    """Exact expected list (ref lib.rs:893-907)."""
    segs = interesting_vertical_segments(_two_box_diagram())
    assert segs == [
        ((90.0, 90.0), (90.0, 210.0)),
        ((150.0, 90.0), (150.0, 100.0)),
        ((210.0, 90.0), (210.0, 210.0)),
        ((290.0, 90.0), (290.0, 210.0)),
        ((410.0, 90.0), (410.0, 210.0)),
    ]


def test_visibility_graph_two_boxes():
    """Graph construction runs and is consistent (the reference's test
    lib.rs:910-935 only prints; we assert structural invariants)."""
    graph = OrthogonalVisibilityGraph(_two_box_diagram())
    # All ports are vertices: top port (150, 100), right port (200, 150),
    # left port of box 2 (300, 150).
    assert (150.0, 100.0) in graph.vertices
    assert (200.0, 150.0) in graph.vertices
    assert (300.0, 150.0) in graph.vertices
    # Edges connect exact segment endpoints that are vertices.
    for (x1, y1), (x2, y2) in graph.edges:
        assert x1 == x2 or y1 == y2
        assert (x1, y1) in graph.vertices and (x2, y2) in graph.vertices
        assert (x1, y1) <= (x2, y2) or (y1 <= y2)
    # The port-to-port corridor at y=150 exists.
    assert ((200.0, 150.0), (290.0, 150.0)) in graph.edges


def test_port_position_quirk():
    """Top/bottom port x-offsets scale by rect HEIGHT; left/right port
    y-offsets by rect WIDTH (ref lib.rs:436-462; observed behavior that must
    be preserved — SURVEY.md §2.3)."""
    # Non-square box: 100 wide, 40 tall.
    diagram = Diagram([
        GeomBox(rect=(0.0, 0.0, 100.0, 40.0), padding=Padding.uniform(0.0),
                ports=Ports(1, 1, 0, 0)),
    ])
    graph = OrthogonalVisibilityGraph(diagram)
    # top port x = left + height * 1/2 = 20 (NOT width/2 = 50)
    assert (20.0, 0.0) in graph.vertices
    # right port y = top + width * 1/2 = 50 (NOT height/2 = 20)
    assert (100.0, 50.0) in graph.vertices


def test_property_no_crash_and_invariants():
    """Property test in the spirit of the reference proptest
    (lib.rs:804-828): arbitrary boxes never crash, segments are axis-aligned
    at the claimed orientation."""
    rng = random.Random(0)
    for _ in range(25):
        n = rng.randint(1, 6)
        boxes = []
        for _ in range(n):
            x1, y1 = rng.uniform(0, 100), rng.uniform(0, 100)
            x2, y2 = rng.uniform(0, 100), rng.uniform(0, 100)
            boxes.append(
                GeomBox(
                    rect=(x1, y1, x2, y2),
                    padding=Padding.uniform(rng.uniform(0, 10)),
                    ports=Ports(rng.randint(0, 4), rng.randint(0, 4),
                                rng.randint(0, 4), rng.randint(0, 4)),
                )
            )
        diagram = Diagram(boxes)
        h = interesting_horizontal_segments(diagram)
        v = interesting_vertical_segments(diagram)
        assert all(s[0][1] == s[1][1] for s in h)
        assert all(s[0][0] == s[1][0] for s in v)
        n_events_h = sum(2 + b.ports.left + b.ports.right for b in boxes)
        n_events_v = sum(2 + b.ports.top + b.ports.bottom for b in boxes)
        assert len(h) == n_events_h
        assert len(v) == n_events_v
        OrthogonalVisibilityGraph(diagram)  # must not crash


def test_edges_match_bruteforce_all_pairs():
    """The segment-endpoint edge construction must equal the reference's
    O(V^2) all-pairs scan (lib.rs:676-696)."""
    rng = random.Random(1)
    for _ in range(5):
        boxes = []
        for i in range(rng.randint(2, 4)):
            x1, y1 = rng.uniform(0, 50) + 60 * i, rng.uniform(0, 50)
            boxes.append(
                GeomBox(rect=(x1, y1, x1 + 20, y1 + 20),
                        padding=Padding.uniform(5.0), ports=Ports(1, 1, 1, 1))
            )
        diagram = Diagram(boxes)
        graph = OrthogonalVisibilityGraph(diagram)
        h_set = graph.interesting_horizontal_segments
        v_set = graph.interesting_vertical_segments
        expected = set()
        for v1 in graph.vertices:
            for v2 in graph.vertices:
                if v1[0] == v2[0] and v1[1] <= v2[1]:
                    if (v1, v2) in v_set or (v2, v1) in v_set:
                        expected.add((v1, v2))
                elif v1[1] == v2[1] and v1[0] <= v2[0]:
                    if (v1, v2) in h_set or (v2, v1) in h_set:
                        expected.add((v1, v2))
        assert graph.edges == expected


def test_bench_diagonal_layout_runs():
    """The criterion benchmark layout: 36 diagonal boxes
    (ref benches/geom_benchmark.rs:6-27)."""
    boxes = [
        GeomBox(rect=(i * 100.0, i * 100.0, (i + 1) * 100.0, (i + 1) * 100.0),
                padding=Padding.uniform(10.0), ports=Ports(1, 1, 1, 1))
        for i in range(36)
    ]
    graph = OrthogonalVisibilityGraph(Diagram(boxes))
    assert len(graph.vertices) > 100
    assert len(graph.edges) > 0


def test_render_svg(tmp_path):
    path = str(tmp_path / "out.svg")
    svg = render_svg(_two_box_diagram(), path)
    assert svg.startswith("<svg")
    assert "<circle" in svg and "<rect" in svg
    with open(path) as f:
        assert f.read() == svg
