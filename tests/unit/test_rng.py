"""Threefry sampler tests: determinism, stream decorrelation, distribution
(SURVEY.md §4.1). Bit-exactness across backends is what makes the CPU
oracle comparable to TPU renders; determinism here underwrites that."""

import numpy as np

from pathtracer_tpu.sampling import rng


def test_deterministic():
    a = np.asarray(rng.bounce_uniforms(7, 0, 1, 64))
    b = np.asarray(rng.bounce_uniforms(7, 0, 1, 64))
    np.testing.assert_array_equal(a, b)


def test_streams_distinct():
    base = np.asarray(rng.bounce_uniforms(0, 0, 0, 256))
    for seed, spp, bounce in [(1, 0, 0), (0, 1, 0), (0, 0, 1)]:
        other = np.asarray(rng.bounce_uniforms(seed, spp, bounce, 256))
        assert np.abs(base - other).max() > 1e-3


def test_jitter_stream_distinct_from_bounces():
    jit = np.asarray(rng.pixel_jitter(0, 0, 256))
    for bounce in range(8):
        b = np.asarray(rng.bounce_uniforms(0, 0, bounce, 256))
        assert np.abs(jit - b[:, :2]).max() > 1e-3


def test_uniform_distribution():
    u = np.asarray(rng.bounce_uniforms(0, 0, 0, 4096)).ravel()
    assert 0.0 <= u.min() and u.max() < 1.0
    np.testing.assert_allclose(u.mean(), 0.5, atol=0.01)
    np.testing.assert_allclose(u.var(), 1.0 / 12.0, atol=0.005)
    # Lag-1 correlation within a stream should be ~0.
    c = np.corrcoef(u[:-1], u[1:])[0, 1]
    assert abs(c) < 0.05


def test_draw_layout_stable():
    # The slot layout is part of the oracle/TPU contract; freezing it here
    # turns silent renumbering into a test failure.
    assert (
        rng.LIGHT_SEL,
        rng.LIGHT_U1,
        rng.LIGHT_U2,
        rng.BSDF_U1,
        rng.BSDF_U2,
        rng.RR_U,
    ) == (0, 1, 2, 3, 4, 5)
    assert rng.N_DRAWS == 6
