"""Unit tests for decode ops against independent numpy oracles."""

import numpy as np
import jax.numpy as jnp

from vrdd_tpu.io.synthetic import random_histogram_volume, synthetic_fractal_volume
from vrdd_tpu.ops.fractal import fractal_decode_batch
from vrdd_tpu.ops.histogram import (
    flex_block_stats,
    fractal_block_stats,
    normalize_histogram,
    raw_block_stats,
)
from vrdd_tpu.ops.sparse import densify_sparse_histograms


def _np_raw_stats(hist, n_bins=32, vmax=0.0217):
    """Independent oracle mirroring d_basicDataProcessing:742-769."""
    bw = vmax / n_bins
    i = np.arange(n_bins)
    centers = bw * i + bw / 2.0
    edges = (i / n_bins) * vmax
    mean = (hist * centers).sum(-1)
    var = (hist * (edges - mean[..., None]) ** 2).sum(-1)
    with np.errstate(divide="ignore"):
        lg = np.where(hist > 0, np.log2(np.where(hist > 0, hist, 1.0)), 0.0)
    ent = -(hist * lg).sum(-1) / np.log2(n_bins)
    return mean / 0.0217, var / 0.000021, ent


def test_raw_block_stats_matches_reference_formulas():
    h = random_histogram_volume((4, 5, 6), seed=1)
    out = np.asarray(raw_block_stats(jnp.asarray(h)))
    m, v, e = _np_raw_stats(h)
    np.testing.assert_allclose(out[..., 0], m, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[..., 1], v, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out[..., 2], e, rtol=1e-5, atol=1e-6)


def test_fractal_stats_use_bin_centers_for_variance():
    # A histogram concentrated in one bin: variance about centers must be 0,
    # variance about left edges (raw path) must be (bw/2)^2 / 0.000021.
    h = np.zeros((1, 1, 1, 32), dtype=np.float32)
    h[..., 7] = 1.0
    raw = np.asarray(raw_block_stats(jnp.asarray(h)))[0, 0, 0]
    fra = np.asarray(fractal_block_stats(jnp.asarray(h)))[0, 0, 0]
    bw = 0.0217 / 32
    np.testing.assert_allclose(fra[1], 0.0, atol=1e-8)
    np.testing.assert_allclose(raw[1], (bw / 2) ** 2 / 0.000021, rtol=1e-4)
    # means agree (both use centers)
    np.testing.assert_allclose(raw[0], fra[0], rtol=1e-6)


def test_entropy_uniform_is_one():
    h = np.full((1, 1, 1, 32), 1 / 32, dtype=np.float32)
    out = np.asarray(raw_block_stats(jnp.asarray(h)))
    np.testing.assert_allclose(out[..., 2], 1.0, rtol=1e-5)


def test_flex_stats_value_domain():
    h = np.zeros((2, 64), dtype=np.float32)
    h[0, 0] = 1.0  # first bin center = 255/64/2
    h[1, :] = 1 / 64
    out = np.asarray(flex_block_stats(jnp.asarray(h)))
    np.testing.assert_allclose(out[0, 0], 255.0 / 64 / 2, rtol=1e-5)
    np.testing.assert_allclose(out[1, 2], 1.0, rtol=1e-5)  # uniform entropy
    np.testing.assert_allclose(out[1, 0], (255.0 / 64) * (np.arange(64) + 0.5).mean(), rtol=1e-5)


def test_fractal_decode_batch_matches_loop_oracle():
    t, cb, eb, ev, expected = synthetic_fractal_volume((3, 4, 5), seed=2)
    cbf = cb.reshape(-1, 4)
    out = fractal_decode_batch(
        jnp.asarray(t)[cbf[:, 0]],
        jnp.asarray(cbf[:, 1]),
        jnp.asarray(cbf[:, 2]),
        jnp.asarray(eb.reshape(len(cbf), -1)),
        jnp.asarray(ev.reshape(len(cbf), -1)),
        jnp.asarray(cbf[:, 3]),
    )
    np.testing.assert_allclose(
        np.asarray(out), expected.reshape(len(cbf), -1), rtol=1e-5, atol=1e-6
    )


def test_normalize_histogram_clamps_and_sums_to_one():
    h = jnp.asarray([[0.5, -0.2, 0.9, 0.0], [0.0, 0.0, 0.0, 0.0]])
    normed, total = normalize_histogram(h)
    np.testing.assert_allclose(np.asarray(normed.sum(-1)), [1.0, 0.0], atol=1e-6)
    assert (np.asarray(normed) >= 0).all()


def test_densify_sparse_histograms():
    bin_ids = np.array([[1, 3, 0], [2, 0, 0]], dtype=np.int32)
    freqs = np.array([[0.5, 0.5, 99.0], [1.0, 99.0, 99.0]], dtype=np.float32)
    counts = np.array([2, 1], dtype=np.int32)
    dense = np.asarray(densify_sparse_histograms(bin_ids, freqs, counts, 6))
    expected = np.zeros((2, 6), dtype=np.float32)
    expected[0, 1] = 0.5
    expected[0, 3] = 0.5
    expected[1, 2] = 1.0
    np.testing.assert_allclose(dense, expected)


def test_gaussian_stats_pinned_constants():
    """Pins the Gaussian decode's exact semantics — mean/variance are the
    moments; the entropy channel is a FRAMEWORK EXTENSION (no reference
    counterpart, see ops/gaussian.py): logistic(0.5*log2(2*pi*e*sigma^2)/8).
    Any change to the /8 temperature or the squash breaks these literals."""
    from vrdd_tpu.ops.gaussian import gaussian_stats

    mu = jnp.asarray([0.3, -1.0, 2.0])
    sigma = jnp.asarray([0.1, 1.0, 4.0])
    got = np.asarray(gaussian_stats(mu, sigma))
    expected = np.array([
        [0.3, 0.01, 0.46024558],
        [-1.0, 1.0, 0.56362492],
        [2.0, 16.0, 0.62384176],
    ], dtype=np.float32)
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-7)
    # analytic cross-check of the formula itself at sigma = 1
    ent_bits = 0.5 * np.log2(2 * np.pi * np.e)
    np.testing.assert_allclose(
        got[1, 2], 1.0 / (1.0 + np.exp(-ent_bits / 8.0)), rtol=1e-6
    )
    # monotone in sigma, bounded in [0, 1)
    assert got[0, 2] < got[1, 2] < got[2, 2] < 1.0
