// Reference-style CPU baseline for the employee-scheduling hot loop.
//
// The reference (asimihsan/constraint-solver) publishes no benchmark numbers
// and no Rust toolchain exists in this environment (BASELINE.md), so this is
// a faithful C++ -O3 stand-in for its hot path, measured on the bench host:
// per local-search iteration the reference draws window_size random
// ChangeDay/SwapDays moves (reference
// examples/employee-scheduling/src/lib.rs:428-491) and FULLY RESCORES each
// candidate clone with the 8-constraint pass — including the per-window
// hash-map employee counting of the 14-day and 7-day window constraints
// (`.counts()` per window, ref lib.rs:317-339) and the per-weekday count
// maps (ref lib.rs:194-218).  Reported metric: candidate moves evaluated
// per second.
//
// Build: g++ -O3 -march=native -o baseline_scheduling baseline_scheduling.cc
// Run:   ./baseline_scheduling [days] [employees] [seconds]

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <unordered_map>
#include <vector>

struct Score {
  double hard = 0.0, soft = 0.0;
  bool operator<(const Score& o) const {
    return hard != o.hard ? hard < o.hard : soft < o.soft;
  }
};

// start_weekday = 0 (Monday); weekend = Sat(5)/Sun(6).
static inline bool is_weekend(int day) { return ((day % 7) >= 5); }

static Score score_full(const std::vector<int32_t>& a, int n_emp,
                        const std::vector<uint8_t>& holiday /* [E*D] */) {
  const int d = (int)a.size();
  Score s;

  // H1 — holidays (ref lib.rs:272-280).
  for (int e = 0; e < n_emp; ++e)
    for (int day = 0; day < d; ++day)
      if (holiday[(size_t)e * d + day] && a[day] == e) s.hard += 1.0;

  // H2 — consecutive days, windows(2) (ref lib.rs:285-292).
  for (int day = 0; day + 1 < d; ++day)
    if (a[day] == a[day + 1]) s.hard += 1.0;

  // H3 — consecutive weekends, windows(9) (ref lib.rs:294-315).
  for (int w = 0; w + 9 <= d; ++w) {
    if (!(is_weekend(w) && is_weekend(w + 1))) continue;
    if (a[w] == a[w + 7]) s.hard += 1.0;
    if (a[w] == a[w + 8]) s.hard += 1.0;
    if (a[w + 1] == a[w + 7]) s.hard += 1.0;
    if (a[w + 1] == a[w + 8]) s.hard += 1.0;
  }

  // H4 — > 3 shifts per 14-day window, hash counting per window like the
  // reference's `.counts()` (ref lib.rs:317-327).
  for (int w = 0; w + 14 <= d; ++w) {
    std::unordered_map<int, int> counts;
    for (int k = 0; k < 14; ++k) counts[a[w + k]]++;
    for (const auto& kv : counts)
      if (kv.second > 3) s.hard += 1.0;
  }

  // S1 — > 2 shifts per 7-day window (ref lib.rs:329-339).
  for (int w = 0; w + 7 <= d; ++w) {
    std::unordered_map<int, int> counts;
    for (int k = 0; k < 7; ++k) counts[a[w + k]]++;
    for (const auto& kv : counts)
      if (kv.second > 2) s.soft += 1.0;
  }

  // S2 — weekday consistency Mon-Fri (ref lib.rs:194-218, :341-342).
  for (int wd = 0; wd < 5; ++wd) {
    std::unordered_map<int, int> counts;
    for (int day = wd; day < d; day += 7) counts[a[day]]++;
    if (counts.size() > 1) {
      int mn = 1 << 30;
      for (const auto& kv : counts)
        if (kv.second < mn) mn = kv.second;
      s.soft += (double)mn;
    }
  }

  // S3/S4 — max-min spreads over employees with >= 1 day (ref :344-365).
  std::vector<int> tot(n_emp, 0), wk(n_emp, 0);
  for (int day = 0; day < d; ++day) {
    tot[a[day]]++;
    if (is_weekend(day)) wk[a[day]]++;
  }
  int mn_t = 1 << 30, mx_t = -1, mn_w = 1 << 30, mx_w = -1, present = 0;
  for (int e = 0; e < n_emp; ++e) {
    if (tot[e] > 0) {
      ++present;
      if (tot[e] < mn_t) mn_t = tot[e];
      if (tot[e] > mx_t) mx_t = tot[e];
      if (wk[e] < mn_w) mn_w = wk[e];
      if (wk[e] > mx_w) mx_w = wk[e];
    }
  }
  if (present >= 2) s.soft += (double)(mx_t - mn_t) + (double)(mx_w - mn_w);
  return s;
}

int main(int argc, char** argv) {
  const int d = argc > 1 ? atoi(argv[1]) : 365;
  const int n_emp = argc > 2 ? atoi(argv[2]) : 20;
  const double budget_s = argc > 3 ? atof(argv[3]) : 5.0;
  std::mt19937_64 rng(42);
  std::vector<int32_t> assign(d);
  for (int i = 0; i < d; ++i) assign[i] = (int32_t)(rng() % n_emp);
  std::vector<uint8_t> holiday((size_t)n_emp * d, 0);  // no holidays

  const int window = 100;  // ref window_size (employee-scheduling main.rs:27)
  long moves = 0;
  volatile double sink = 0.0;
  Score best{1e18, 1e18};
  auto t0 = std::chrono::steady_clock::now();
  double elapsed = 0.0;
  while (elapsed < budget_s) {
    // One LS iteration: window random candidates, each a clone + full
    // rescore, stepping to the best like ref local_search.rs:315-335.
    Score best_score{1e18, 1e18};
    std::vector<int32_t> best_cand;
    for (int w = 0; w < window; ++w) {
      std::vector<int32_t> cand(assign);  // clone per candidate
      if (rng() % 5 == 0) {               // ChangeDay : SwapDays = 1 : 4
        cand[rng() % d] = (int32_t)(rng() % n_emp);
      } else {
        const int d1 = (int)(rng() % d);
        const int d2 = (int)((d1 + 1 + rng() % (d - 1)) % d);
        std::swap(cand[d1], cand[d2]);
      }
      const Score s = score_full(cand, n_emp, holiday);
      if (s < best_score) { best_score = s; best_cand = cand; }
      ++moves;
      if ((w & 15) == 0) {
        elapsed = std::chrono::duration<double>(
                      std::chrono::steady_clock::now() - t0).count();
        if (elapsed >= budget_s) break;
      }
    }
    if (!best_cand.empty()) assign = best_cand;
    if (best_score < best) best = best_score;
    sink += best_score.hard + best_score.soft;
    elapsed = std::chrono::duration<double>(
                  std::chrono::steady_clock::now() - t0).count();
  }
  printf("%.1f\n", (double)moves / elapsed);
  fprintf(stderr,
          "baseline d=%d e=%d: %ld moves in %.2fs, best (%.0f, %.0f)\n",
          d, n_emp, moves, elapsed, best.hard, best.soft);
  return 0;
}
