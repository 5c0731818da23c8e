"""Blake2 PRNG + exact discrete Gaussian (reference: blake2engine.h,
discretegaussiangenerator.h:48-195)."""

import numpy as np

from openfhe_tpu.utils.prng import Blake2Engine, DiscreteGaussianGenerator


def test_blake2_deterministic_and_distinct():
    a, b, c = Blake2Engine(42), Blake2Engine(42), Blake2Engine(43)
    xa, xb, xc = a.random_u64(64), b.random_u64(64), c.random_u64(64)
    assert np.array_equal(xa, xb)
    assert not np.array_equal(xa, xc)


def test_blake2_integers_uniform():
    eng = Blake2Engine(7)
    draws = eng.integers(0, 10, size=20000)
    counts = np.bincount(draws, minlength=10)
    assert counts.min() > 1700 and counts.max() < 2300
    # bounds respected for a non-power-of-two span
    d2 = eng.integers(5, 12, size=1000)
    assert d2.min() >= 5 and d2.max() < 12


def test_blake2_generator_compatible_with_sampling():
    """The engine drops into every sampling helper that takes an rng."""
    from openfhe_tpu.utils import sampling
    eng = Blake2Engine(99)
    s = sampling.ternary_coeffs(256, eng)
    assert set(np.unique(s)) <= {-1, 0, 1}
    e = sampling.gaussian_coeffs(256, eng, 3.19)
    assert np.abs(e).max() < 30
    sp = sampling.sparse_ternary_coeffs(128, 32, eng)
    assert int((sp != 0).sum()) == 32


def test_dgg_inversion_moments():
    dgg = DiscreteGaussianGenerator(3.19)
    eng = Blake2Engine(1)
    x = dgg.generate(20000, eng)
    assert abs(x.mean()) < 0.1
    assert abs(x.std() - 3.19) < 0.12


def test_dgg_karney_moments_and_exactness():
    """Karney Algorithm D: correct moments; integer-only accept path (the
    sampler works even where double CDF tables would saturate)."""
    dgg = DiscreteGaussianGenerator(3.19)
    eng = Blake2Engine(2)
    x = dgg.generate(5000, eng, method="karney")
    assert abs(x.mean()) < 0.15
    assert abs(x.std() - 3.19) < 0.15
    # distribution symmetry
    assert abs((x > 0).sum() - (x < 0).sum()) < 300


def test_dgg_large_sigma_karney():
    """Flooding-scale sigma (2^20): Karney still exact-samples fine."""
    dgg = DiscreteGaussianGenerator(float(1 << 20), tail_factor=8.0)
    eng = Blake2Engine(3)
    x = dgg.generate_karney(400, eng)
    assert abs(x.std() / float(1 << 20) - 1.0) < 0.15
