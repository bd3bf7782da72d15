// Sanitizer harness for the threaded native engine (race + memory
// checking of cavlc_prepare_rows_batch and friends).  Built with
// -fsanitize=thread or -fsanitize=address,undefined by the Makefile
// `tsan`/`asan` targets and run by tests/test_native.py; SURVEY.md §5
// notes the reference needs no race detection (single-threaded C) — the
// round-3 batch ingest introduced std::thread fan-out, so this closes
// the gap for the new code.
//
// Includes the engine TU directly so the anonymous-namespace MBRec
// layout is shared (the check always matches the code it checks).

#include "cavlc_decode.cpp"

#include <cstdio>
#include <vector>

int main() {
  const int R = 8, C = 9, M = R * C;
  // Synthesize a donor grid: skips + P_16x16 with varied mvds + one
  // P_8x8 (residual-free: cbp 0 everywhere, so no src spans needed).
  std::vector<MBRec> grid(M);
  for (int m = 0; m < M; ++m) {
    MBRec* mb = &grid[m];
    init_mb(mb);
    if (m % 3 == 0) {
      mb->kind = 0;  // P_Skip
      continue;
    }
    mb->kind = 1;
    if (m == 40) {
      mb->mb_type = 3;  // P_8x8
      for (int i = 0; i < 4; ++i) mb->sub_mb_types[i] = 0;
      mb->n_ref = 4;
      for (int i = 0; i < 4; ++i) mb->ref_idx[i] = 0;
      mb->n_mvds = 4;
      for (int i = 0; i < 4; ++i) {
        mb->mvds[i][0] = (i - 2) * 3;
        mb->mvds[i][1] = 5 - i;
      }
    } else {
      mb->mb_type = 0;
      mb->n_ref = 1;
      mb->ref_idx[0] = 0;
      mb->n_mvds = 1;
      mb->mvds[0][0] = (m % 7) - 3;
      mb->mvds[0][1] = (m % 5) - 2;
    }
    mb->cbp = 0;
    mb->qp_delta = kNoQp;
  }

  // Emit the grid as a P-slice payload (num_ref_idx_l0 = 1).
  std::vector<uint8_t> payload(1 << 16);
  long nbits = 0;
  int err = cavlc_emit_slice(grid.data(), C, R, 1, 1, nullptr, nullptr,
                             0, 0, payload.data(), (long)payload.size(),
                             &nbits, 0);
  if (err) { std::fprintf(stderr, "emit err %d\n", err); return 1; }
  long nbytes = (nbits + 7) / 8;

  const int N = 32, S_ROW = 64;
  std::vector<uint8_t> concat;
  std::vector<long> offsets(N + 1, 0), start_bits(N, 0);
  for (int i = 0; i < N; ++i) {
    concat.insert(concat.end(), payload.begin(), payload.begin() + nbytes);
    offsets[i + 1] = offsets[i] + nbytes;
  }

  // Static-chrome rings: all valid (0, 0, 0).
  std::vector<int32_t> tr((C + 2) * 3, 0), lr(R * 3, 0),
      rr((R - 1) * 3, 0);
  std::vector<uint8_t> tv(C + 2, 1), lv(R, 1), rv(R - 1, 1);
  int32_t ref_map[1] = {0};

  std::vector<uint32_t> out_pat((long)N * R * S_ROW);
  std::vector<int32_t> out_nb((long)N * R * S_ROW);
  std::vector<int32_t> first_c((long)N * R);
  std::vector<uint8_t> coded((long)N * M);
  std::vector<int32_t> oa((long)N * M * 3), ob((long)N * M * 3),
      od((long)N * M * 3);
  std::vector<long> dbits(N);
  std::vector<int32_t> halign(N), errs(N);

  for (int retarget = 0; retarget <= 1; ++retarget) {
    err = cavlc_prepare_rows_batch(
        concat.data(), offsets.data(), start_bits.data(), N, R, C, 1, 2,
        ref_map, 1, 0, 0, tr.data(), tv.data(), lr.data(), lv.data(),
        rr.data(), rv.data(), S_ROW, out_pat.data(), out_nb.data(),
        first_c.data(), coded.data(), oa.data(), ob.data(), od.data(),
        dbits.data(), halign.data(), errs.data(), 4, 0, retarget,
        0);
    if (err) { std::fprintf(stderr, "batch err %d\n", err); return 1; }
    for (int i = 0; i < N; ++i)
      if (errs[i]) {
        std::fprintf(stderr, "donor %d err %d (retarget %d)\n", i,
                     errs[i], retarget);
        return 1;
      }
    // All donors are identical: outputs must be identical per donor
    // (a cheap cross-thread determinism check).
    for (int i = 1; i < N; ++i) {
      if (dbits[i] != dbits[0]) {
        std::fprintf(stderr, "donor_bits mismatch %d\n", i);
        return 1;
      }
      for (long k = 0; k < (long)R * S_ROW; ++k)
        if (out_pat[(long)i * R * S_ROW + k] != out_pat[k]) {
          std::fprintf(stderr, "pattern mismatch donor %d\n", i);
          return 1;
        }
    }
  }
  std::printf("sanitize_check OK (%ld payload bytes, %d donors, "
              "4 threads, plain+retarget)\n", nbytes, N);
  return 0;
}
