"""HE-standard lattice security tables and parameter validation.

Role of the reference's ``lattice/stdlatticeparms.h:63-95``: the
HomomorphicEncryption.org standard tables mapping (secret distribution,
security level, ring dimension) -> maximum log2(Q*P) for which the RLWE
instance meets the target security. ``GenCryptoContext`` in the reference
validates the generated modulus chain against these tables and bumps the
ring dimension when needed; ``gen_context`` here does the same when a
``security_level`` is requested.

Values are the published HE-standard numbers (the same constants compiled
into the reference; they are public-domain standard data, not code).
"""

from __future__ import annotations

from enum import Enum


class SecurityLevel(str, Enum):
    HEStd_NotSet = "HEStd_NotSet"
    HEStd_128_classic = "HEStd_128_classic"
    HEStd_192_classic = "HEStd_192_classic"
    HEStd_256_classic = "HEStd_256_classic"
    HEStd_128_quantum = "HEStd_128_quantum"
    HEStd_192_quantum = "HEStd_192_quantum"
    HEStd_256_quantum = "HEStd_256_quantum"


class SecretDist(str, Enum):
    UNIFORM_TERNARY = "ternary"
    ERROR = "error"
    UNIFORM = "uniform"


_RING_DIMS = (1024, 2048, 4096, 8192, 16384, 32768, 65536, 131072)

# maxlogq[dist][level] = per-ring-dim max log2(QP), index-aligned with
# _RING_DIMS. Source: HE standard v1.1 tables (stdlatticeparms.h:63-95).
_MAXLOGQ = {
    SecretDist.UNIFORM_TERNARY: {
        SecurityLevel.HEStd_128_classic: (27, 54, 109, 218, 438, 881, 1772, 3576),
        SecurityLevel.HEStd_192_classic: (19, 37, 75, 152, 305, 611, 1228, 2474),
        SecurityLevel.HEStd_256_classic: (14, 29, 58, 118, 237, 476, 956, 1923),
        SecurityLevel.HEStd_128_quantum: (25, 51, 101, 202, 411, 827, 1665, 3358),
        SecurityLevel.HEStd_192_quantum: (17, 35, 70, 141, 284, 570, 1147, 2304),
        SecurityLevel.HEStd_256_quantum: (13, 27, 54, 109, 220, 443, 890, 1792),
    },
    SecretDist.ERROR: {
        SecurityLevel.HEStd_128_classic: (29, 56, 111, 220, 440, 883, 1774, 3578),
        SecurityLevel.HEStd_192_classic: (21, 39, 77, 154, 307, 613, 1230, 2476),
        SecurityLevel.HEStd_256_classic: (16, 31, 60, 120, 239, 478, 958, 1925),
        SecurityLevel.HEStd_128_quantum: (27, 53, 103, 204, 413, 829, 1667, 3360),
        SecurityLevel.HEStd_192_quantum: (19, 37, 72, 143, 286, 572, 1149, 2306),
        SecurityLevel.HEStd_256_quantum: (15, 29, 56, 111, 222, 445, 892, 1794),
    },
    SecretDist.UNIFORM: {
        SecurityLevel.HEStd_128_classic: (29, 56, 111, 220, 440, 883, 1774, 3578),
        SecurityLevel.HEStd_192_classic: (21, 39, 77, 154, 307, 613, 1230, 2476),
        SecurityLevel.HEStd_256_classic: (16, 31, 60, 120, 239, 478, 958, 1925),
        SecurityLevel.HEStd_128_quantum: (27, 53, 103, 204, 413, 829, 1667, 3360),
        SecurityLevel.HEStd_192_quantum: (19, 37, 72, 143, 286, 572, 1149, 2306),
        SecurityLevel.HEStd_256_quantum: (15, 29, 56, 111, 222, 445, 892, 1794),
    },
}


def max_log_q(n: int, level: SecurityLevel,
              dist: SecretDist = SecretDist.UNIFORM_TERNARY) -> int:
    """Maximum log2(QP) permitted at ring dimension ``n`` for ``level``.

    Ring dims below the table floor inherit the 1024 entry scaled down is
    NOT allowed by the standard — we return 0 (insecure at any modulus),
    matching the reference's behavior of rejecting such configs.
    """
    level = SecurityLevel(level)
    dist = SecretDist(dist)
    if level == SecurityLevel.HEStd_NotSet:
        raise ValueError("max_log_q undefined for HEStd_NotSet")
    table = _MAXLOGQ[dist][level]
    if n < _RING_DIMS[0]:
        return 0
    best = 0
    for dim, logq in zip(_RING_DIMS, table):
        if n >= dim:
            best = logq
        else:
            break
    return best


def min_ring_dim(log_qp: int, level: SecurityLevel,
                 dist: SecretDist = SecretDist.UNIFORM_TERNARY) -> int:
    """Smallest standard ring dimension whose table row admits log2(QP)
    = ``log_qp`` at ``level`` (role of the ring-dim bump loop in the
    reference's ``ParamsGen*`` implementations)."""
    level = SecurityLevel(level)
    dist = SecretDist(dist)
    if level == SecurityLevel.HEStd_NotSet:
        return 0
    table = _MAXLOGQ[dist][level]
    for dim, maxq in zip(_RING_DIMS, table):
        if log_qp <= maxq:
            return dim
    raise ValueError(
        f"log2(QP)={log_qp} exceeds the HE-standard table even at "
        f"n={_RING_DIMS[-1]} for {level.value}")


def validate(n: int, log_qp: int, level: SecurityLevel,
             dist: SecretDist = SecretDist.UNIFORM_TERNARY) -> None:
    """Raise if (n, log2 QP) violates the requested security level."""
    level = SecurityLevel(level)
    if level == SecurityLevel.HEStd_NotSet:
        return
    allowed = max_log_q(n, level, dist)
    if log_qp > allowed:
        raise ValueError(
            f"insecure parameters: ring dim {n} admits log2(QP) <= {allowed} "
            f"at {level.value}, but the modulus chain has log2(QP) = {log_qp}; "
            f"increase ring_dim to >= {min_ring_dim(log_qp, level, dist)}")
