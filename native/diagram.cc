// Orthogonal connector-routing geometry — native C++ core.
//
// Re-implementation of the reference diagram crate's geometry layer
// (reference examples/diagram/src/{primitives,geometry,lib}.rs) following
// Dwyer/Marriott/Stuckey "Fast Node Overlap Removal" (2005) and
// Wybrow/Marriott/Stuckey "Orthogonal connector routing" (2009) — the same
// papers the reference cites at lib.rs:487-507.
//
// Coordinates are Q32.32 fixed point in int64 (the reference's
// fixed::types::I32F32 Unit, primitives.rs:8-12) for deterministic exact
// comparisons and hashing.
//
// Semantics preserved exactly, including the observed port-position quirk:
// top/bottom port x-offsets scale by rect HEIGHT and left/right port
// y-offsets scale by rect WIDTH (reference lib.rs:436-462; see SURVEY.md
// §2.3 note — tests use square boxes so the quirk is intentional-looking
// but load-bearing for parity).
//
// Exposed as a plain C ABI consumed from Python via ctypes.

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <set>
#include <vector>

namespace {

using fix = int64_t;
constexpr double kScale = 4294967296.0;  // 2^32

fix from_double(double v) { return (fix)llround(v * kScale); }
double to_double(fix v) { return (double)v / kScale; }
fix fmul(fix a, fix b) { return (fix)(((__int128)a * (__int128)b) >> 32); }
fix fdiv(fix a, fix b) { return (fix)((((__int128)a) << 32) / (__int128)b); }

struct Box {
  // rect is normalized: (min_x, min_y) .. (max_x, max_y)
  fix min_x, min_y, max_x, max_y;
  fix pad_t, pad_r, pad_b, pad_l;
  int ports_t, ports_r, ports_b, ports_l;

  fix width() const { return max_x - min_x; }
  fix height() const { return max_y - min_y; }
  fix top_y(bool padded) const { return padded ? min_y - pad_t : min_y; }
  fix bottom_y(bool padded) const { return padded ? max_y + pad_b : max_y; }
  fix left_x(bool padded) const { return padded ? min_x - pad_l : min_x; }
  fix right_x(bool padded) const { return padded ? max_x + pad_r : max_x; }

  // Port positions (reference lib.rs:436-462, incl. the width/height swap).
  void top_port(int i, bool padded, fix* x, fix* y) const {
    fix frac = fdiv(from_double(i + 1), from_double(ports_t + 1));
    *x = left_x(false) + fmul(height(), frac);
    *y = top_y(padded);
  }
  void bottom_port(int i, bool padded, fix* x, fix* y) const {
    fix frac = fdiv(from_double(i + 1), from_double(ports_b + 1));
    *x = left_x(false) + fmul(height(), frac);
    *y = bottom_y(padded);
  }
  void left_port(int i, bool padded, fix* x, fix* y) const {
    fix frac = fdiv(from_double(i + 1), from_double(ports_l + 1));
    *x = left_x(padded);
    *y = top_y(false) + fmul(width(), frac);
  }
  void right_port(int i, bool padded, fix* x, fix* y) const {
    fix frac = fdiv(from_double(i + 1), from_double(ports_r + 1));
    *x = right_x(padded);
    *y = top_y(false) + fmul(width(), frac);
  }

  std::array<fix, 4> h_sort_key() const {
    return {left_x(true), right_x(true), top_y(true), bottom_y(true)};
  }
  std::array<fix, 4> v_sort_key() const {
    return {top_y(true), bottom_y(true), left_x(true), right_x(true)};
  }
};

enum EventType { kOpen = 0, kNearPort = 1, kFarPort = 2, kClose = 3 };
// For the horizontal sweep: NearPort = LeftPort, FarPort = RightPort.
// For the vertical sweep:   NearPort = TopPort,  FarPort = BottomPort.

struct Event {
  EventType type;
  fix pos;
  int box;
  int port;
};

std::vector<Box> parse_boxes(const double* data, int n) {
  std::vector<Box> boxes(n);
  for (int i = 0; i < n; ++i) {
    const double* d = data + 12 * i;
    fix x1 = from_double(d[0]), y1 = from_double(d[1]);
    fix x2 = from_double(d[2]), y2 = from_double(d[3]);
    Box& b = boxes[i];
    b.min_x = std::min(x1, x2);
    b.max_x = std::max(x1, x2);
    b.min_y = std::min(y1, y2);
    b.max_y = std::max(y1, y2);
    b.pad_t = from_double(d[4]);
    b.pad_r = from_double(d[5]);
    b.pad_b = from_double(d[6]);
    b.pad_l = from_double(d[7]);
    b.ports_t = (int)d[8];
    b.ports_r = (int)d[9];
    b.ports_b = (int)d[10];
    b.ports_l = (int)d[11];
  }
  return boxes;
}

struct Bounds {
  fix min_x, min_y, max_x, max_y;
};

Bounds bounding_box(const std::vector<Box>& boxes) {
  Bounds r{INT64_MAX, INT64_MAX, INT64_MIN, INT64_MIN};
  for (const Box& b : boxes) {
    r.min_x = std::min(r.min_x, b.left_x(true));
    r.min_y = std::min(r.min_y, b.top_y(true));
    r.max_x = std::max(r.max_x, b.right_x(true));
    r.max_y = std::max(r.max_y, b.bottom_y(true));
  }
  return r;
}

using Seg = std::array<fix, 4>;  // x1, y1, x2, y2

// One sweep.  horizontal=true: vertical sweep emitting horizontal segments
// (reference get_interesting_horizontal_segments, lib.rs:509-560);
// horizontal=false: the dual (lib.rs:562-618).  Event tie-order is the
// stable per-box order Open, NearPorts, FarPorts, Close, matching the
// reference's per-box iterators (lib.rs:63-294).
std::vector<Seg> interesting_segments(const std::vector<Box>& boxes,
                                      bool horizontal) {
  const Bounds bounds = bounding_box(boxes);
  std::vector<Event> events;
  for (int i = 0; i < (int)boxes.size(); ++i) {
    const Box& b = boxes[i];
    fix px, py;
    if (horizontal) {
      events.push_back({kOpen, b.top_y(true), i, 0});
      for (int p = 0; p < b.ports_l; ++p) {
        b.left_port(p, false, &px, &py);
        events.push_back({kNearPort, py, i, p});
      }
      for (int p = 0; p < b.ports_r; ++p) {
        b.right_port(p, false, &px, &py);
        events.push_back({kFarPort, py, i, p});
      }
      events.push_back({kClose, b.bottom_y(true), i, 0});
    } else {
      events.push_back({kOpen, b.left_x(true), i, 0});
      for (int p = 0; p < b.ports_t; ++p) {
        b.top_port(p, false, &px, &py);
        events.push_back({kNearPort, px, i, p});
      }
      for (int p = 0; p < b.ports_b; ++p) {
        b.bottom_port(p, false, &px, &py);
        events.push_back({kFarPort, px, i, p});
      }
      events.push_back({kClose, b.right_x(true), i, 0});
    }
  }
  std::stable_sort(events.begin(), events.end(),
                   [](const Event& a, const Event& b) { return a.pos < b.pos; });

  // Open-box scan list ordered by the reference's 4-field lexicographic key
  // (lib.rs:323-339 / :358-374).  Equal-key boxes compare equal (BTreeSet
  // set-semantics), so no index tiebreak.
  auto key_of = [&](int i) {
    return horizontal ? boxes[i].h_sort_key() : boxes[i].v_sort_key();
  };
  auto cmp = [&](int a, int b) { return key_of(a) < key_of(b); };
  std::set<int, decltype(cmp)> open(cmp);

  std::vector<Seg> result;
  result.reserve(events.size());
  for (const Event& e : events) {
    const Box& b = boxes[e.box];
    // Low side of the emitted segment.
    fix lo;
    if (e.type == kFarPort) {
      lo = horizontal ? b.right_x(false) : b.bottom_y(false);
    } else {
      auto it = open.lower_bound(e.box);  // first element >= self
      if (it == open.begin()) {
        lo = horizontal ? bounds.min_x : bounds.min_y;
      } else {
        const Box& nb = boxes[*std::prev(it)];
        lo = horizontal ? nb.right_x(true) : nb.bottom_y(true);
      }
    }
    // High side.
    fix hi;
    if (e.type == kNearPort) {
      hi = horizontal ? b.left_x(false) : b.top_y(false);
    } else {
      auto it = open.upper_bound(e.box);  // first element > self
      if (it == open.end()) {
        hi = horizontal ? bounds.max_x : bounds.max_y;
      } else {
        const Box& nb = boxes[*it];
        hi = horizontal ? nb.left_x(true) : nb.top_y(true);
      }
    }
    if (horizontal) {
      result.push_back({lo, e.pos, hi, e.pos});
    } else {
      result.push_back({e.pos, lo, e.pos, hi});
    }
    if (e.type == kOpen) open.insert(e.box);
    if (e.type == kClose) open.erase(e.box);
  }
  return result;
}

// H x V segment intersection (reference geometry.rs:6-28): intersect unless
// h lies entirely to one side of v.x or v entirely to one side of h.y;
// intersection point is (v.x, h.y).
bool h_v_intersection(const Seg& h, const Seg& v, fix* x, fix* y) {
  fix p0x = h[0], p0y = h[1], p1x = h[2];
  fix p2x = v[0], p2y = v[1], p3y = v[3];
  if (p0x < p2x && p1x < p2x) return false;
  if (p0x > p2x && p1x > p2x) return false;
  if (p2y < p0y && p3y < p0y) return false;
  if (p2y > p0y && p3y > p0y) return false;
  *x = p2x;
  *y = p0y;
  return true;
}

double* alloc_out(const std::vector<double>& v) {
  double* out = (double*)malloc(v.size() * sizeof(double));
  memcpy(out, v.data(), v.size() * sizeof(double));
  return out;
}

}  // namespace

extern "C" {

// Box layout: 12 doubles each —
//   x1, y1, x2, y2, pad_top, pad_right, pad_bottom, pad_left,
//   ports_top, ports_right, ports_bottom, ports_left
// Segments out: 4 doubles each (x1, y1, x2, y2), in sweep emission order
// (duplicates included, matching the reference Vec return).
int csp_interesting_segments(const double* box_data, int n_boxes,
                             int horizontal, double** out, int* out_n) {
  std::vector<Box> boxes = parse_boxes(box_data, n_boxes);
  std::vector<Seg> segs = interesting_segments(boxes, horizontal != 0);
  std::vector<double> flat;
  flat.reserve(segs.size() * 4);
  for (const Seg& s : segs)
    for (fix c : s) flat.push_back(to_double(c));
  *out = alloc_out(flat);
  *out_n = (int)segs.size();
  return 0;
}

// Full orthogonal visibility graph (reference OrthogonalVisibilityGraph::new,
// lib.rs:628-705): vertices = all ports (unpadded) + all H x V segment
// intersections; edges = vertex pairs that are exactly the endpoints of an
// interesting segment (normalized to ascending coordinate).
int csp_visibility_graph(const double* box_data, int n_boxes,
                         double** out_verts, int* n_verts,
                         double** out_edges, int* n_edges) {
  std::vector<Box> boxes = parse_boxes(box_data, n_boxes);
  std::vector<Seg> h_raw = interesting_segments(boxes, true);
  std::vector<Seg> v_raw = interesting_segments(boxes, false);
  std::set<Seg> h_segs(h_raw.begin(), h_raw.end());
  std::set<Seg> v_segs(v_raw.begin(), v_raw.end());

  std::set<std::array<fix, 2>> vertices;
  for (const Box& b : boxes) {
    fix x, y;
    for (int p = 0; p < b.ports_t; ++p) { b.top_port(p, false, &x, &y); vertices.insert({x, y}); }
    for (int p = 0; p < b.ports_r; ++p) { b.right_port(p, false, &x, &y); vertices.insert({x, y}); }
    for (int p = 0; p < b.ports_b; ++p) { b.bottom_port(p, false, &x, &y); vertices.insert({x, y}); }
    for (int p = 0; p < b.ports_l; ++p) { b.left_port(p, false, &x, &y); vertices.insert({x, y}); }
  }
  for (const Seg& h : h_segs) {
    for (const Seg& v : v_segs) {
      fix x, y;
      if (h_v_intersection(h, v, &x, &y)) vertices.insert({x, y});
    }
  }

  // Edges: equivalent to the reference's all-pairs scan (lib.rs:676-696) —
  // an edge (v1, v2) exists iff the exact line between the two vertices is
  // an interesting segment (either orientation); normalized ascending.
  std::set<Seg> edges;
  auto try_edge = [&](const Seg& s, bool vertical) {
    std::array<fix, 2> a{s[0], s[1]}, b{s[2], s[3]};
    // A degenerate (point) pair falls into the reference's vertical branch
    // only (lib.rs:678 checks x-equality first), so a zero-length segment
    // that exists only in the horizontal set contributes no edge.
    if (!vertical && a == b) return;
    if (!vertices.count(a) || !vertices.count(b)) return;
    bool swap = vertical ? (a[1] > b[1]) : (a[0] > b[0]);
    if (swap) std::swap(a, b);
    edges.insert({a[0], a[1], b[0], b[1]});
  };
  for (const Seg& s : v_segs) try_edge(s, true);
  for (const Seg& s : h_segs) try_edge(s, false);

  std::vector<double> vflat;
  vflat.reserve(vertices.size() * 2);
  for (const auto& v : vertices) {
    vflat.push_back(to_double(v[0]));
    vflat.push_back(to_double(v[1]));
  }
  std::vector<double> eflat;
  eflat.reserve(edges.size() * 4);
  for (const Seg& e : edges)
    for (fix c : e) eflat.push_back(to_double(c));

  *out_verts = alloc_out(vflat);
  *n_verts = (int)vertices.size();
  *out_edges = alloc_out(eflat);
  *n_edges = (int)edges.size();
  return 0;
}

void csp_free(double* p) { free(p); }

}  // extern "C"
