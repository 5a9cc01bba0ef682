// Reference-style CPU baseline for the N-Queens hot loop.
//
// The reference (asimihsan/constraint-solver) publishes no benchmark numbers
// and no Rust toolchain exists in this environment (BASELINE.md), so this is
// a faithful C++ -O3 stand-in for its hot path, measured on the bench host:
// per local-search iteration the reference proposes candidate moves and
// FULLY RESCORES each candidate clone with the O(n^2) pairwise conflict scan
// (reference local-search/src/local_search.rs:315-323 driving
// examples/nqueens/src/lib.rs:74-87, one Vec clone per candidate at
// lib.rs:227).  Reported metric: candidate moves evaluated per second.
//
// Build: g++ -O3 -march=native -o baseline_nqueens baseline_nqueens.cc
// Run:   ./baseline_nqueens [n] [seconds]

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

static long score_full(const std::vector<int32_t>& rows) {
  // O(n^2) pairwise scan, x2-pair convention (ref lib.rs:74-87).
  const int n = (int)rows.size();
  long total = 0;
  for (int c1 = 0; c1 < n; ++c1) {
    for (int c2 = c1 + 1; c2 < n; ++c2) {
      const long rd = rows[c2] - rows[c1];
      const long cd = c2 - c1;
      if (rd == 0 || (rd < 0 ? -rd : rd) == cd) total += 2;
    }
  }
  return total;
}

int main(int argc, char** argv) {
  const int n = argc > 1 ? atoi(argv[1]) : 1000;
  const double budget_s = argc > 2 ? atof(argv[2]) : 5.0;
  std::mt19937_64 rng(42);
  std::vector<int32_t> rows(n);
  for (int i = 0; i < n; ++i) rows[i] = (int32_t)(rng() % n);

  const int window = 5 * n;  // ref window_size = board_size * 5 (main.rs:130)
  long moves = 0;
  long best = 1L << 60;
  volatile long sink = 0;
  auto t0 = std::chrono::steady_clock::now();
  double elapsed = 0.0;
  while (elapsed < budget_s) {
    // One LS iteration: window candidates, each a clone + full rescore,
    // stepping to the best like ref local_search.rs:323-335.
    long best_score = 1L << 60;
    int best_col = 0, best_row = 0;
    for (int w = 0; w < window; ++w) {
      std::vector<int32_t> cand(rows);           // clone per candidate
      const int col = (int)(rng() % n);
      cand[col] = (int32_t)(rng() % n);
      const long s = score_full(cand);
      if (s < best_score) { best_score = s; best_col = col; best_row = cand[col]; }
      ++moves;
      if ((w & 63) == 0) {
        elapsed = std::chrono::duration<double>(
                      std::chrono::steady_clock::now() - t0).count();
        if (elapsed >= budget_s) break;
      }
    }
    rows[best_col] = (int32_t)best_row;
    if (best_score < best) best = best_score;
    sink += best_score;
    elapsed = std::chrono::duration<double>(
                  std::chrono::steady_clock::now() - t0).count();
  }
  printf("%.1f\n", (double)moves / elapsed);
  fprintf(stderr, "baseline n=%d: %ld moves in %.2fs, best seen %ld (sink %ld)\n",
          n, moves, elapsed, best, sink);
  return 0;
}
