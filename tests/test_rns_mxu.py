"""MXU digit-matmul ApproxSwitchCRTBasis (ops/rns_mxu.py) must be
bit-exact vs an exact host-integer evaluation of the HPS formula AND vs
the VPU u32 path (which routes to the MXU form for L >= 6, so the host
oracle is the independent reference)."""

import numpy as np

from openfhe_tpu.ops import limb, rns, rns_mxu
from openfhe_tpu.utils import nbtheory


def _host_switch(x_np, from_m, to_m):
    """Exact-integer ApproxSwitchCRTBasis (dcrtpoly-impl.h:1034 formula)."""
    Q = 1
    for q in from_m:
        Q *= q
    qhat = [Q // q for q in from_m]
    qhat_inv = [pow(h, -1, q) for h, q in zip(qhat, from_m)]
    n = x_np.shape[1]
    out = np.zeros((len(to_m), n), dtype=object)
    for c in range(n):
        ys = [int(x_np[i, c]) * qhat_inv[i] % from_m[i]
              for i in range(len(from_m))]
        for j, p in enumerate(to_m):
            out[j, c] = sum(y * (qh % p) for y, qh in zip(ys, qhat)) % p
    return out


def test_mxu_switch_basis_bit_exact():
    n = 64
    from_m = tuple(nbtheory.generate_prime_chain(6, 30, n))
    to_m = tuple(nbtheory.generate_prime_chain(7, 29, n,
                                               avoid=list(from_m)))
    rng = np.random.default_rng(0)
    x_np = np.stack([rng.integers(0, q, size=n, dtype=np.uint64)
                     for q in from_m])
    x = limb.from_int_array(x_np)
    want = _host_switch(x_np, from_m, to_m)
    got_mxu = np.asarray(
        rns_mxu.approx_switch_basis_mxu(x, from_m, to_m).lo).astype(object)
    got_routed = np.asarray(
        rns.approx_switch_basis(x, from_m, to_m).lo).astype(object)
    assert (got_mxu == want).all()
    assert (got_routed == want).all()


def test_vpu_u32_switch_basis_matches_host_oracle():
    """L < 6 keeps the plain VPU u32 path; pin it to the same oracle."""
    n = 64
    from_m = tuple(nbtheory.generate_prime_chain(3, 30, n))
    to_m = tuple(nbtheory.generate_prime_chain(4, 29, n,
                                               avoid=list(from_m)))
    rng = np.random.default_rng(1)
    x_np = np.stack([rng.integers(0, q, size=n, dtype=np.uint64)
                     for q in from_m])
    x = limb.from_int_array(x_np)
    want = _host_switch(x_np, from_m, to_m)
    got = np.asarray(rns.approx_switch_basis(x, from_m, to_m).lo
                     ).astype(object)
    assert (got == want).all()
