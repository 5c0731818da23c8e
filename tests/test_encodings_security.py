"""Host-side parity tests: HE-standard security tables (stdlatticeparms.h)
and coef/string encodings (coefpackedencoding.cpp, stringencoding.cpp)."""

import pytest

from openfhe_tpu import encoding
from openfhe_tpu.utils import security
from openfhe_tpu.utils.security import SecretDist, SecurityLevel


class TestSecurityTables:
    def test_standard_values(self):
        # spot values straight from the HE standard table
        assert security.max_log_q(8192, SecurityLevel.HEStd_128_classic) == 218
        assert security.max_log_q(16384, SecurityLevel.HEStd_192_quantum) == 284
        assert security.max_log_q(32768, SecurityLevel.HEStd_256_classic) == 476

    def test_non_table_dim_rejected(self):
        # exact-dim lookup: a dim with no table row admits no modulus
        # (FindMaxQ returns 0 on map miss, stdlatticeparms.h:151-154)
        assert security.max_log_q(12288, SecurityLevel.HEStd_128_classic) == 0
        # uniform secrets have no 65536 row in the reference table
        assert security.max_log_q(
            65536, SecurityLevel.HEStd_128_classic, SecretDist.UNIFORM) == 0

    def test_reference_spot_rows(self):
        # verbatim rows from stdlatticeparms.cpp
        assert security.max_log_q(
            32768, SecurityLevel.HEStd_128_classic, SecretDist.UNIFORM) == 880
        assert security.max_log_q(
            32768, SecurityLevel.HEStd_192_classic, SecretDist.UNIFORM) == 612
        assert security.max_log_q(
            32768, SecurityLevel.HEStd_192_quantum) == 571
        assert security.max_log_q(
            65536, SecurityLevel.HEStd_128_classic, SecretDist.ERROR) == 1774

    def test_ring_dim_doubles_past_table(self):
        # FindRingDim returns 2*n beyond the largest row
        assert security.min_ring_dim(
            2000, SecurityLevel.HEStd_128_classic) == 131072

    def test_min_ring_dim(self):
        assert security.min_ring_dim(100, SecurityLevel.HEStd_128_classic) == 4096
        assert security.min_ring_dim(219, SecurityLevel.HEStd_128_classic) == 16384

    def test_validate_raises(self):
        with pytest.raises(ValueError):
            security.validate(1024, 60, SecurityLevel.HEStd_128_classic)
        security.validate(4096, 100, SecurityLevel.HEStd_128_classic)
        security.validate(128, 10**6, SecurityLevel.HEStd_NotSet)  # no-op

    def test_gen_context_enforces(self):
        from openfhe_tpu.models import ckks
        with pytest.raises(ValueError):
            ckks.gen_context(ckks.CKKSParams(
                ring_dim=1 << 10, mult_depth=2, scaling_mod_size=50,
                first_mod_size=60, security_level="HEStd_128_classic"))

    def test_error_dist_table(self):
        assert security.max_log_q(
            4096, SecurityLevel.HEStd_128_classic, SecretDist.ERROR) == 111


class TestCoefStringEncoding:
    def test_coef_roundtrip_signed(self):
        t, n = 65537, 32
        vals = [0, 1, -1, 12345, -32768, 32768]
        coeffs = encoding.coef_encode(vals, n, t)
        assert len(coeffs) == n
        assert encoding.coef_decode(coeffs, n, t, len(vals)) == vals

    def test_coef_overflow_raises(self):
        with pytest.raises(ValueError):
            encoding.coef_encode(list(range(9)), 8, 17)

    def test_string_roundtrip(self):
        msg = "OpenFHE on TPU!"
        coeffs = encoding.string_encode(msg, 64)
        assert encoding.string_decode(coeffs) == msg

    def test_string_unicode(self):
        msg = "héllo"
        coeffs = encoding.string_encode(msg, 32)
        assert encoding.string_decode(coeffs) == msg
