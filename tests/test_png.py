"""PNG rasterizer: file validity and render parity with the SVG pipeline.

The reference demo renders PNG via usvg/resvg (reference diagram
main.rs:44-156); diagram/png.py replaces that with a dependency-free
rasterizer validated here by decoding the file with stdlib zlib.
"""

import struct
import zlib

import numpy as np

from constraint_solver_tpu.diagram.geometry import (
    Diagram,
    GeomBox,
    Padding,
)
from constraint_solver_tpu.diagram.png import (
    Canvas,
    render_png,
    render_routed_png,
    write_png,
)


def _decode(path):
    data = open(path, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", data[16:24])
    i = data.find(b"IDAT")
    ln = struct.unpack(">I", data[i - 4 : i])[0]
    raw = zlib.decompress(data[i + 4 : i + 4 + ln])
    assert len(raw) == h * (1 + w * 3)
    rows = [
        np.frombuffer(raw[y * (1 + w * 3) + 1 : (y + 1) * (1 + w * 3)], np.uint8)
        for y in range(h)
    ]
    assert all(raw[y * (1 + w * 3)] == 0 for y in range(h))  # filter type 0
    return np.stack(rows).reshape(h, w, 3)


def test_write_png_roundtrip(tmp_path):
    rgb = np.zeros((5, 7, 3), np.uint8)
    rgb[2, 3] = (10, 200, 30)
    p = str(tmp_path / "t.png")
    write_png(rgb, p)
    assert np.array_equal(_decode(p), rgb)


def test_canvas_primitives():
    cv = Canvas(0, 0, 10, 10, scale=1.0)
    cv.fill_rect(1, 1, 4, 4, (1, 2, 3), border=(9, 9, 9))
    assert tuple(cv.buf[2, 2]) == (1, 2, 3)
    assert tuple(cv.buf[1, 1]) == (9, 9, 9)
    cv.line(0, 8, 10, 8, (5, 5, 5))
    assert tuple(cv.buf[8, 0]) == (5, 5, 5) and tuple(cv.buf[8, 10]) == (5, 5, 5)
    # Diagonal request draws an orthogonal elbow, never a diagonal.
    cv2 = Canvas(0, 0, 10, 10)
    cv2.line(0, 0, 6, 6, (7, 7, 7))
    assert tuple(cv2.buf[0, 6]) == (7, 7, 7)  # corner of the elbow
    assert tuple(cv2.buf[3, 3]) == (255, 255, 255)  # not on the diagonal


def test_offcanvas_primitives_draw_nothing():
    # A primitive fully above/left of the canvas must be clipped away, not
    # wrap around via a negative slice stop.
    cv = Canvas(0, 0, 10, 10)
    cv.line(2, -3, 8, -3, (1, 1, 1))
    cv.line(-4, 2, -4, 9, (1, 1, 1), width=3)
    cv.dot(-5, -5, (1, 1, 1), r=2)
    cv.fill_rect(-9, -9, -2, -2, (1, 1, 1))
    assert np.all(cv.buf == 255)
    # Partially visible primitives clip to the visible part.
    cv.line(-5, 4, 3, 4, (2, 2, 2))
    assert tuple(cv.buf[4, 0]) == (2, 2, 2) and tuple(cv.buf[4, 3]) == (2, 2, 2)
    assert np.all(cv.buf[4, 4:] == 255)


def test_render_demo_png(tmp_path):
    boxes = [
        GeomBox(
            rect=(100.0 + 150 * i, 100.0 + 150 * j, 200.0 + 150 * i, 200.0 + 150 * j),
            padding=Padding.uniform(10.0),
        )
        for i in range(3)
        for j in range(3)
    ]
    p = str(tmp_path / "demo.png")
    shape = render_png(Diagram(boxes), p)
    img = _decode(p)
    assert img.shape[:2] == shape
    # Box fill color appears; background is white.
    assert (img == np.array([232, 240, 254], np.uint8)).all(-1).any()
    assert (img == 255).all(-1).any()


def test_render_routed_png(tmp_path):
    boxes = [
        GeomBox(rect=(100.0 * i, 0.0, 100.0 * i + 60.0, 60.0),
                padding=Padding.uniform(5.0))
        for i in range(3)
    ]
    p = str(tmp_path / "routed.png")
    shape = render_routed_png(boxes, [(0, 1), (1, 2)], p)
    img = _decode(p)
    assert img.shape[:2] == shape
    # Route color present.
    assert (img == np.array([24, 128, 56], np.uint8)).all(-1).any()
