// CPU sparse Schur bundle-adjustment baseline — the fair "g2o-class" solver
// the TPU local BA is benchmarked against (BASELINE.md >=10x target).
//
// Implements exactly the structure g2o's BlockSolver_6_3 + LinearSolverEigen
// executes for `Optimizer::LocalBundleAdjustment`
// (`orb_slam3/src/Optimizer.cc:1030`): per-iteration Jacobian assembly over
// the observation list, 3x3 point-block inversion, Schur-reduced camera
// system assembled from per-point observer pairs, dense Cholesky, point
// back-substitution, Huber robust weights. Hand-rolled, -O3, no deps.
//
// Usage: ba_baseline <problem.bin> [iters]
//   problem.bin: int32 L,F,P; f64 X[P*3]; f64 K[4]; f64 tvec[L*3];
//                int32 obs[L*F]; f64 uv[L*F*2]   (little-endian)
// Prints milliseconds for the timed solve.

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

static void mat3_inv(const double* A, double* out) {
  double a = A[0], b = A[1], c = A[2], d = A[3], e = A[4], f = A[5];
  double g = A[6], h = A[7], i = A[8];
  double A11 = e * i - f * h, A12 = c * h - b * i, A13 = b * f - c * e;
  double A21 = f * g - d * i, A22 = a * i - c * g, A23 = c * d - a * f;
  double A31 = d * h - e * g, A32 = b * g - a * h, A33 = a * e - b * d;
  double det = a * A11 + b * A21 + c * A31;
  double id = 1.0 / (std::abs(det) < 1e-12 ? 1e-12 : det);
  out[0] = A11 * id; out[1] = A12 * id; out[2] = A13 * id;
  out[3] = A21 * id; out[4] = A22 * id; out[5] = A23 * id;
  out[6] = A31 * id; out[7] = A32 * id; out[8] = A33 * id;
}

// dense LLT solve, n x n (in-place on copies)
static bool llt_solve(std::vector<double>& A, std::vector<double>& b, int n) {
  for (int k = 0; k < n; ++k) {
    double d = A[k * n + k];
    for (int j = 0; j < k; ++j) d -= A[k * n + j] * A[k * n + j];
    if (d <= 0) return false;
    d = std::sqrt(d);
    A[k * n + k] = d;
    for (int i = k + 1; i < n; ++i) {
      double s = A[i * n + k];
      for (int j = 0; j < k; ++j) s -= A[i * n + j] * A[k * n + j];
      A[i * n + k] = s / d;
    }
  }
  for (int i = 0; i < n; ++i) {  // forward
    double s = b[i];
    for (int j = 0; j < i; ++j) s -= A[i * n + j] * b[j];
    b[i] = s / A[i * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {  // backward
    double s = b[i];
    for (int j = i + 1; j < n; ++j) s -= A[j * n + i] * b[j];
    b[i] = s / A[i * n + i];
  }
  return true;
}

static void rodrigues(const double* w, double* R) {
  double th = std::sqrt(w[0] * w[0] + w[1] * w[1] + w[2] * w[2]);
  double I[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
  if (th < 1e-12) { memcpy(R, I, sizeof(I)); return; }
  double k[3] = {w[0] / th, w[1] / th, w[2] / th};
  double Kx[9] = {0, -k[2], k[1], k[2], 0, -k[0], -k[1], k[0], 0};
  double K2[9];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int l = 0; l < 3; ++l) s += Kx[i * 3 + l] * Kx[l * 3 + j];
      K2[i * 3 + j] = s;
    }
  double st = std::sin(th), ct = 1 - std::cos(th);
  for (int i = 0; i < 9; ++i) R[i] = I[i] + st * Kx[i] + ct * K2[i];
}

int main(int argc, char** argv) {
  if (argc < 2) { fprintf(stderr, "usage: %s problem.bin [iters] [stage2] [reps]\n", argv[0]); return 1; }
  int iters = argc > 2 ? atoi(argv[2]) : 6;
  // stage2 > 0 appends the reference two-stage scheme (`Optimizer.cc:1030`
  // tail, same as the TPU solve's `stage2_iters`): after `iters` LM steps,
  // edges with chi2 > 5.991 at the current estimate are dropped and the
  // solve continues for `stage2` more iterations on the inlier set.
  int stage2 = argc > 3 ? atoi(argv[3]) : 0;
  // reps > 1 times a BATCH of identical-size solves back to back and prints
  // the per-solve mean — the symmetric-accounting counterpart of the TPU's
  // batched dispatch (on this 1-core host the CPU has no batch resource to
  // amortize over, which is exactly what the comparison should show)
  int reps = argc > 4 ? atoi(argv[4]) : 1;
  FILE* fp = fopen(argv[1], "rb");
  if (!fp) { perror("open"); return 1; }
  int32_t L, F, P;
  if (fread(&L, 4, 1, fp) + fread(&F, 4, 1, fp) + fread(&P, 4, 1, fp) != 3) return 1;
  std::vector<double> X(P * 3), Kc(4), tvec(L * 3), uv((size_t)L * F * 2);
  std::vector<int32_t> obs((size_t)L * F);
  if (fread(X.data(), 8, X.size(), fp) != X.size()) return 1;
  if (fread(Kc.data(), 8, 4, fp) != 4) return 1;
  if (fread(tvec.data(), 8, tvec.size(), fp) != tvec.size()) return 1;
  if (fread(obs.data(), 4, obs.size(), fp) != obs.size()) return 1;
  if (fread(uv.data(), 8, uv.size(), fp) != uv.size()) return 1;
  fclose(fp);

  // observation list + per-point observer index (built once, like g2o's
  // edge containers)
  struct Obs { int l, p; double u, v; };
  std::vector<Obs> ol;
  ol.reserve((size_t)L * F);
  for (int l = 0; l < L; ++l)
    for (int f = 0; f < F; ++f) {
      int p = obs[(size_t)l * F + f];
      if (p >= 0)
        ol.push_back({l, p, uv[((size_t)l * F + f) * 2], uv[((size_t)l * F + f) * 2 + 1]});
    }
  int O = (int)ol.size();
  std::vector<int> pstart(P + 1, 0);
  for (auto& o : ol) pstart[o.p + 1]++;
  for (int p = 0; p < P; ++p) pstart[p + 1] += pstart[p];
  std::vector<int> pobs(O);
  { std::vector<int> cur(pstart.begin(), pstart.end() - 1);
    for (int o = 0; o < O; ++o) pobs[cur[ol[o].p]++] = o; }

  std::vector<double> R(L * 9), t(L * 3), rv(L * 3, 0.0), x(X);
  for (int l = 0; l < L; ++l) {
    double I[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
    memcpy(&R[l * 9], I, sizeof(I));
    for (int i = 0; i < 3; ++i) t[l * 3 + i] = -tvec[l * 3 + i];
  }

  std::vector<double> Wo((size_t)O * 18), WHi((size_t)O * 18), wob(O);
  std::vector<double> Hcc(L * 36), bc(L * 6), Hpp(P * 9), Hpi(P * 9), bp(P * 3);
  std::vector<double> S((size_t)L * L * 36), rhs(L * 6);
  const double huber = std::sqrt(5.991), lam = 1e-4;
  const double fx = Kc[0], fy = Kc[1], cx = Kc[2], cy = Kc[3];

  std::vector<double> R_init(R), t_init(t), x_init(x);
  std::vector<char> active(O, 1);
  auto t0 = std::chrono::steady_clock::now();
  for (int rep = 0; rep < reps; ++rep) {
  R = R_init; t = t_init; x = x_init;
  std::fill(active.begin(), active.end(), 1);
  for (int it = 0; it < iters + stage2; ++it) {
    std::fill(Hcc.begin(), Hcc.end(), 0.0); std::fill(bc.begin(), bc.end(), 0.0);
    std::fill(Hpp.begin(), Hpp.end(), 0.0); std::fill(bp.begin(), bp.end(), 0.0);
    std::fill(S.begin(), S.end(), 0.0);
    for (int o = 0; o < O; ++o) {
      const Obs& e = ol[o];
      const double* Rl = &R[e.l * 9];
      const double* Xp = &x[e.p * 3];
      double pc[3];
      for (int i = 0; i < 3; ++i)
        pc[i] = Rl[i * 3] * Xp[0] + Rl[i * 3 + 1] * Xp[1] + Rl[i * 3 + 2] * Xp[2] + t[e.l * 3 + i];
      double z = pc[2] > 1e-9 ? pc[2] : 1e-9;
      double iz = 1.0 / z;
      double ru = e.u - (fx * pc[0] * iz + cx);
      double rvv = e.v - (fy * pc[1] * iz + cy);
      double chi = ru * ru + rvv * rvv;
      // stage boundary: drop outlier edges by chi2 at the current estimate,
      // keep optimizing (identical semantics to the TPU scan's stage2_mask)
      if (it == iters) active[o] = (chi <= 5.991 && pc[2] > 0) ? 1 : 0;
      double w = pc[2] > 0 ? std::fmin(1.0, huber / std::sqrt(chi > 1e-12 ? chi : 1e-12)) : 0.0;
      if (it >= iters) w *= active[o];
      wob[o] = w;
      double a00 = fx * iz, a02 = -fx * pc[0] * iz * iz;
      double a11 = fy * iz, a12 = -fy * pc[1] * iz * iz;
      double Ju[6] = {-a00, 0, -a02, -a02 * pc[1], -a00 * pc[2] + a02 * pc[0], a00 * pc[1]};
      double Jv[6] = {0, -a11, -a12, a11 * pc[2] - a12 * pc[1], a12 * pc[0], -a11 * pc[0]};
      double Pu[3], Pv[3];
      for (int d = 0; d < 3; ++d) {
        Pu[d] = -(a00 * Rl[d] + a02 * Rl[6 + d]);
        Pv[d] = -(a11 * Rl[3 + d] + a12 * Rl[6 + d]);
      }
      double* H = &Hcc[e.l * 36];
      double* b = &bc[e.l * 6];
      for (int i = 0; i < 6; ++i) {
        b[i] += w * (Ju[i] * ru + Jv[i] * rvv);
        for (int j = 0; j < 6; ++j) H[i * 6 + j] += w * (Ju[i] * Ju[j] + Jv[i] * Jv[j]);
      }
      double* Hp = &Hpp[e.p * 9];
      double* bpp = &bp[e.p * 3];
      for (int i = 0; i < 3; ++i) {
        bpp[i] += w * (Pu[i] * ru + Pv[i] * rvv);
        for (int j = 0; j < 3; ++j) Hp[i * 3 + j] += w * (Pu[i] * Pu[j] + Pv[i] * Pv[j]);
      }
      double* Wb = &Wo[(size_t)o * 18];
      for (int i = 0; i < 6; ++i)
        for (int j = 0; j < 3; ++j) Wb[i * 3 + j] = w * (Ju[i] * Pu[j] + Jv[i] * Pv[j]);
    }
    // invert damped point blocks; WHi = Wo * Hpi
    for (int p = 0; p < P; ++p) {
      double* Hp = &Hpp[p * 9];
      double tr = Hp[0] + Hp[4] + Hp[8];
      double l2 = lam * (1.0 + tr / 3.0);
      Hp[0] += l2; Hp[4] += l2; Hp[8] += l2;
      if (tr < 1e-12) { memset(&Hpi[p * 9], 0, 72); continue; }
      mat3_inv(Hp, &Hpi[p * 9]);
    }
    for (int o = 0; o < O; ++o) {
      const double* Wb = &Wo[(size_t)o * 18];
      const double* Hi = &Hpi[ol[o].p * 9];
      double* Wh = &WHi[(size_t)o * 18];
      for (int i = 0; i < 6; ++i)
        for (int j = 0; j < 3; ++j)
          Wh[i * 3 + j] = Wb[i * 3] * Hi[j] + Wb[i * 3 + 1] * Hi[3 + j] + Wb[i * 3 + 2] * Hi[6 + j];
    }
    // Schur off-diagonals: per-point observer pairs (g2o's structure)
    for (int p = 0; p < P; ++p) {
      for (int ia = pstart[p]; ia < pstart[p + 1]; ++ia) {
        int oa = pobs[ia];
        int la = ol[oa].l;
        const double* A = &WHi[(size_t)oa * 18];
        for (int ib = pstart[p]; ib < pstart[p + 1]; ++ib) {
          int ob = pobs[ib];
          int lb = ol[ob].l;
          const double* B = &Wo[(size_t)ob * 18];
          double* Sb = &S[((size_t)la * L + lb) * 36];
          for (int i = 0; i < 6; ++i)
            for (int j = 0; j < 6; ++j)
              Sb[i * 6 + j] -= A[i * 3] * B[j * 3] + A[i * 3 + 1] * B[j * 3 + 1] + A[i * 3 + 2] * B[j * 3 + 2];
        }
      }
    }
    // diagonal + damping + rhs
    for (int l = 0; l < L; ++l) {
      double* Sb = &S[((size_t)l * L + l) * 36];
      double* H = &Hcc[l * 36];
      double tr = 0;
      for (int i = 0; i < 6; ++i) tr += H[i * 6 + i];
      double l2 = lam * (1.0 + tr / 6.0);
      for (int i = 0; i < 36; ++i) Sb[i] += H[i];
      for (int i = 0; i < 6; ++i) Sb[i * 6 + i] += l2;
      for (int i = 0; i < 6; ++i) rhs[l * 6 + i] = -bc[l * 6 + i];
    }
    for (int o = 0; o < O; ++o) {  // rhs += WHi * bp
      const double* A = &WHi[(size_t)o * 18];
      const double* bpp = &bp[ol[o].p * 3];
      double* r = &rhs[ol[o].l * 6];
      for (int i = 0; i < 6; ++i)
        r[i] += A[i * 3] * bpp[0] + A[i * 3 + 1] * bpp[1] + A[i * 3 + 2] * bpp[2];
    }
    // gauge: first two cameras fixed
    for (int g = 0; g < 2 && g < L; ++g) {
      for (int l = 0; l < L; ++l) {
        memset(&S[((size_t)g * L + l) * 36], 0, 288);
        memset(&S[((size_t)l * L + g) * 36], 0, 288);
      }
      double* Sb = &S[((size_t)g * L + g) * 36];
      for (int i = 0; i < 6; ++i) Sb[i * 6 + i] = 1.0;
      memset(&rhs[g * 6], 0, 48);
    }
    // flatten block matrix to dense row-major [6L,6L] and solve
    int n = 6 * L;
    std::vector<double> Sm((size_t)n * n), bv(rhs);
    for (int la = 0; la < L; ++la)
      for (int lb = 0; lb < L; ++lb) {
        const double* Sb = &S[((size_t)la * L + lb) * 36];
        for (int i = 0; i < 6; ++i)
          memcpy(&Sm[(size_t)(la * 6 + i) * n + lb * 6], &Sb[i * 6], 48);
      }
    if (!llt_solve(Sm, bv, n)) { fprintf(stderr, "LLT failed\n"); return 2; }
    for (int g = 0; g < 2 && g < L; ++g) memset(&bv[g * 6], 0, 48);
    // backsub: dp = Hpi * (-(bp + Wo^T dc))
    std::vector<double> wtd(P * 3, 0.0);
    for (int o = 0; o < O; ++o) {
      const double* Wb = &Wo[(size_t)o * 18];
      const double* dc = &bv[ol[o].l * 6];
      double* d = &wtd[ol[o].p * 3];
      for (int j = 0; j < 3; ++j)
        for (int i = 0; i < 6; ++i) d[j] += Wb[i * 3 + j] * dc[i];
    }
    for (int p = 0; p < P; ++p) {
      const double* Hi = &Hpi[p * 9];
      double v[3] = {-(bp[p * 3] + wtd[p * 3]), -(bp[p * 3 + 1] + wtd[p * 3 + 1]),
                     -(bp[p * 3 + 2] + wtd[p * 3 + 2])};
      for (int i = 0; i < 3; ++i)
        x[p * 3 + i] += Hi[i * 3] * v[0] + Hi[i * 3 + 1] * v[1] + Hi[i * 3 + 2] * v[2];
    }
    // retract cameras: t += dt; R = exp(dw) R
    for (int l = 0; l < L; ++l) {
      for (int i = 0; i < 3; ++i) t[l * 3 + i] += bv[l * 6 + i];
      double dR[9], Rn[9];
      rodrigues(&bv[l * 6 + 3], dR);
      for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j) {
          double s = 0;
          for (int k = 0; k < 3; ++k) s += dR[i * 3 + k] * R[l * 9 + k * 3 + j];
          Rn[i * 3 + j] = s;
        }
      memcpy(&R[l * 9], Rn, sizeof(Rn));
    }
  }
  }
  auto t1 = std::chrono::steady_clock::now();
  // final chi2 (sanity, stderr)
  double chi2 = 0;
  for (int o = 0; o < O; ++o) {
    const Obs& e = ol[o];
    const double* Rl = &R[e.l * 9];
    const double* Xp = &x[e.p * 3];
    double pc[3];
    for (int i = 0; i < 3; ++i)
      pc[i] = Rl[i * 3] * Xp[0] + Rl[i * 3 + 1] * Xp[1] + Rl[i * 3 + 2] * Xp[2] + t[e.l * 3 + i];
    double z = pc[2] > 1e-9 ? pc[2] : 1e-9;
    double ru = e.u - (fx * pc[0] / z + cx);
    double rvv = e.v - (fy * pc[1] / z + cy);
    chi2 += ru * ru + rvv * rvv;
  }
  fprintf(stderr, "O=%d chi2=%.3f\n", O, chi2);
  printf("%.3f\n",
         std::chrono::duration_cast<std::chrono::microseconds>(t1 - t0).count() / 1000.0 / reps);
  return 0;
}
