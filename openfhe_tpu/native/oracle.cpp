// Native exact-arithmetic oracle for the TPU RNS-FHE framework.
//
// Role: the ground-truth twin of the Pallas/XLA kernels — native 64-bit
// modular arithmetic and negacyclic NTT with true 128-bit intermediates
// (__int128), mirroring the semantics of the reference's intnat math HAL
// (ubintnat.h Barrett/Shoup paths, transformnat-impl.h CT/GS networks)
// without sharing any code. Used from Python via ctypes for large-size
// bit-exact cross-validation (the pure-Python big-int oracle is too slow
// beyond n=2^12) and as a host-side fallback compute path.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -o liboracle.so oracle.cpp

#include <cstdint>
#include <cstring>
#include <vector>

using u64 = uint64_t;
using u128 = unsigned __int128;

namespace {

inline u64 mod_add(u64 a, u64 b, u64 q) {
  u64 s = a + b;
  return s >= q ? s - q : s;
}

inline u64 mod_sub(u64 a, u64 b, u64 q) { return a >= b ? a - b : a + q - b; }

inline u64 mod_mul(u64 a, u64 b, u64 q) {
  return static_cast<u64>((u128)a * b % q);
}

inline u64 mod_pow(u64 a, u64 e, u64 q) {
  u64 r = 1;
  a %= q;
  while (e) {
    if (e & 1) r = mod_mul(r, a, q);
    a = mod_mul(a, a, q);
    e >>= 1;
  }
  return r;
}

// Shoup multiplication: c constant < q, precon = floor(c * 2^64 / q).
inline u64 mod_mul_shoup(u64 x, u64 c, u64 precon, u64 q) {
  u64 h = static_cast<u64>(((u128)x * precon) >> 64);
  u64 r = x * c - h * q;
  return r >= q ? r - q : r;
}

struct NttPlan {
  size_t n;
  u64 q;
  std::vector<u64> psi_br, psi_br_pre;
  std::vector<u64> psi_inv_br, psi_inv_br_pre;
  u64 n_inv, n_inv_pre;
};

inline u64 shoup_precon(u64 c, u64 q) {
  return static_cast<u64>(((u128)c << 64) / q);
}

size_t bitrev(size_t x, int bits) {
  size_t r = 0;
  for (int i = 0; i < bits; ++i) r |= ((x >> i) & 1) << (bits - 1 - i);
  return r;
}

}  // namespace

extern "C" {

void oracle_mod_add_vec(const u64* a, const u64* b, u64* out, u64 q,
                        size_t n) {
  for (size_t i = 0; i < n; ++i) out[i] = mod_add(a[i], b[i], q);
}

void oracle_mod_sub_vec(const u64* a, const u64* b, u64* out, u64 q,
                        size_t n) {
  for (size_t i = 0; i < n; ++i) out[i] = mod_sub(a[i], b[i], q);
}

void oracle_mod_mul_vec(const u64* a, const u64* b, u64* out, u64 q,
                        size_t n) {
  for (size_t i = 0; i < n; ++i) out[i] = mod_mul(a[i], b[i], q);
}

void oracle_mod_exp_vec(const u64* a, const u64* e, u64* out, u64 q,
                        size_t n) {
  for (size_t i = 0; i < n; ++i) out[i] = mod_pow(a[i], e[i], q);
}

// psi must be a primitive 2n-th root of unity mod q.
void* oracle_ntt_plan_new(size_t n, u64 q, u64 psi) {
  auto* p = new NttPlan;
  p->n = n;
  p->q = q;
  int bits = 0;
  while ((size_t(1) << bits) < n) ++bits;
  std::vector<u64> pw(n), pwi(n);
  u64 psi_inv = mod_pow(psi, q - 2, q);
  pw[0] = pwi[0] = 1;
  for (size_t i = 1; i < n; ++i) {
    pw[i] = mod_mul(pw[i - 1], psi, q);
    pwi[i] = mod_mul(pwi[i - 1], psi_inv, q);
  }
  p->psi_br.resize(n);
  p->psi_br_pre.resize(n);
  p->psi_inv_br.resize(n);
  p->psi_inv_br_pre.resize(n);
  for (size_t i = 0; i < n; ++i) {
    size_t r = bitrev(i, bits);
    p->psi_br[i] = pw[r];
    p->psi_br_pre[i] = shoup_precon(pw[r], q);
    p->psi_inv_br[i] = pwi[r];
    p->psi_inv_br_pre[i] = shoup_precon(pwi[r], q);
  }
  p->n_inv = mod_pow(n % q, q - 2, q);
  p->n_inv_pre = shoup_precon(p->n_inv, q);
  return p;
}

void oracle_ntt_plan_free(void* plan) { delete static_cast<NttPlan*>(plan); }

// In-place forward negacyclic NTT (natural order in, bit-reversed out) —
// same network as the JAX implementation; exact value match expected.
void oracle_ntt_forward(void* plan, u64* a) {
  auto* p = static_cast<NttPlan*>(plan);
  const size_t n = p->n;
  const u64 q = p->q;
  size_t t = n;
  for (size_t m = 1; m < n; m <<= 1) {
    t >>= 1;
    for (size_t i = 0; i < m; ++i) {
      const u64 w = p->psi_br[m + i];
      const u64 wp = p->psi_br_pre[m + i];
      const size_t j1 = 2 * i * t;
      for (size_t j = j1; j < j1 + t; ++j) {
        const u64 u = a[j];
        const u64 v = mod_mul_shoup(a[j + t], w, wp, q);
        a[j] = mod_add(u, v, q);
        a[j + t] = mod_sub(u, v, q);
      }
    }
  }
}

void oracle_ntt_inverse(void* plan, u64* a) {
  auto* p = static_cast<NttPlan*>(plan);
  const size_t n = p->n;
  const u64 q = p->q;
  size_t t = 1;
  for (size_t m = n; m > 1; m >>= 1) {
    const size_t h = m >> 1;
    for (size_t i = 0; i < h; ++i) {
      const u64 w = p->psi_inv_br[h + i];
      const u64 wp = p->psi_inv_br_pre[h + i];
      const size_t j1 = 2 * i * t;
      for (size_t j = j1; j < j1 + t; ++j) {
        const u64 u = a[j];
        const u64 v = a[j + t];
        a[j] = mod_add(u, v, q);
        a[j + t] = mod_mul_shoup(mod_sub(u, v, q), w, wp, q);
      }
    }
    t <<= 1;
  }
  for (size_t j = 0; j < n; ++j)
    a[j] = mod_mul_shoup(a[j], p->n_inv, p->n_inv_pre, q);
}

// ApproxSwitchCRTBasis oracle with true 128-bit lazy accumulation,
// mirroring the reference's accumulation strategy (dcrtpoly-impl.h:1046).
void oracle_approx_switch(const u64* x, const u64* from_q, size_t L,
                          const u64* to_q, size_t K, size_t n, u64* out) {
  // xhat_i = x_i * QHatInv_i mod q_i requires big-int QHat; compute
  // QHatInv via CRT-free method: QHat_i mod q_i = prod_{j!=i} q_j mod q_i.
  std::vector<u64> qhat_inv(L);
  for (size_t i = 0; i < L; ++i) {
    u64 prod = 1;
    for (size_t j = 0; j < L; ++j)
      if (j != i) prod = mod_mul(prod, from_q[j] % from_q[i], from_q[i]);
    qhat_inv[i] = mod_pow(prod, from_q[i] - 2, from_q[i]);
  }
  // QHat_i mod p_k = prod_{j!=i} q_j mod p_k
  std::vector<u64> qhat_modp(L * K);
  for (size_t k = 0; k < K; ++k)
    for (size_t i = 0; i < L; ++i) {
      u64 prod = 1;
      for (size_t j = 0; j < L; ++j)
        if (j != i) prod = mod_mul(prod, from_q[j] % to_q[k], to_q[k]);
      qhat_modp[k * L + i] = prod;
    }
  std::vector<u64> xhat(L);
  for (size_t c = 0; c < n; ++c) {
    for (size_t i = 0; i < L; ++i)
      xhat[i] = mod_mul(x[i * n + c], qhat_inv[i], from_q[i]);
    for (size_t k = 0; k < K; ++k) {
      u128 acc = 0;
      for (size_t i = 0; i < L; ++i)
        acc += (u128)xhat[i] * qhat_modp[k * L + i];
      out[k * n + c] = static_cast<u64>(acc % to_q[k]);
    }
  }
}

}  // extern "C"
