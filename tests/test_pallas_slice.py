"""Pallas fused slice kernel vs the XLA slice path (interpreter mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from vrdd_tpu.core.transfer import default_transfer_function, grayscale_ramp
from vrdd_tpu.march.slice import slice_render_image
from vrdd_tpu.pallas.slice_kernel import pallas_slice_render, pallas_supported


def test_pallas_supported_predicate():
    assert pallas_supported((10, 50, 50), 512, 512, 500)
    assert pallas_supported((512, 512, 512), 1024, 1024, 512)  # v2: streamed
    assert pallas_supported((1024, 1024, 1024), 1024, 1024, 1024)
    assert not pallas_supported((8, 1500, 1200), 512, 512, 64)  # plane > VMEM
    assert pallas_supported((10, 50, 50), 500, 300, 100)  # pad+crop handles it
    # the factorized accumulator carries max(4, n_lut) rows: a huge LUT whose
    # single-strip rows outgrow the VMEM budget must go to the XLA path
    assert pallas_supported((64, 64, 64), 1024, 1024, 128, n_lut=64)
    assert not pallas_supported((64, 64, 64), 1024, 1024, 128, n_lut=4096)


def test_fit_plane_chunk():
    from vrdd_tpu.pallas.slice_kernel import _fit_plane_chunk

    assert _fit_plane_chunk(8, 512, 512, 512) == 8      # fits as-is
    assert _fit_plane_chunk(8, 1024, 1024, 1024) == 4   # shrunk to VMEM budget
    assert _fit_plane_chunk(8, 100, 64, 64) == 5        # divisibility
    assert _fit_plane_chunk(4, 7, 64, 64) == 1          # prime plane count


def test_pallas_unaligned_image_pad_crop():
    """Non-tile-aligned image sizes render via grid padding + output crop and
    equal the aligned render's top-left window (identical rays)."""
    rng = np.random.default_rng(3)
    vol = jnp.asarray(rng.random((8, 20, 20), dtype=np.float32))
    tf = jnp.asarray(default_transfer_function())
    o = jnp.asarray([0.0, 0.0, 4.0])
    with pltpu.force_tpu_interpret_mode():
        full = np.asarray(pallas_slice_render(
            vol, o, tf, width=256, height=128, n_planes=16, density=0.4))
        odd = np.asarray(pallas_slice_render(
            vol, o, tf, width=200, height=100, n_planes=16, density=0.4))
    assert odd.shape == (100, 200, 4)
    # same focal => same NDC grid only when width matches; compare vs the
    # XLA path at the odd size instead
    ref = np.asarray(slice_render_image(
        vol, o, 200, 100, tf, 0.4, n_planes=16))
    diff = np.abs(odd - ref)
    assert np.quantile(diff, 0.999) < 1e-4
    assert full.shape == (128, 256, 4)


@pytest.mark.parametrize("tf_name", ["rainbow", "gray"])
def test_pallas_matches_xla_slice(tf_name):
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((8, 20, 20), dtype=np.float32))
    tf = jnp.asarray(
        default_transfer_function() if tf_name == "rainbow" else grayscale_ramp(8)
    )
    o = jnp.asarray([0.0, 0.0, 4.0])
    kwargs = dict(
        width=128, height=128, n_planes=32, density=0.2, brightness=1.1,
        transfer_offset=0.02, transfer_scale=1.1,
    )
    ref = np.asarray(
        slice_render_image(
            vol, o, kwargs["width"], kwargs["height"], tf,
            kwargs["density"], kwargs["brightness"], kwargs["transfer_offset"],
            kwargs["transfer_scale"], n_planes=kwargs["n_planes"],
        )
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pallas_slice_render(vol, o, tf, **kwargs))
    diff = np.abs(got - ref)
    # allow isolated opacity-cutoff flips; bulk must match tightly
    assert np.quantile(diff, 0.999) < 1e-4, np.quantile(diff, 0.999)
    assert diff.max() < 0.05, diff.max()


def test_empty_space_skip_exact():
    """TF-interval tile culling: with a zero-alpha band in the LUT, the
    ESS-enabled render equals the XLA slice path on a mostly-empty volume
    (skipped samples contribute exactly nothing)."""
    rng = np.random.default_rng(5)
    vol = np.zeros((16, 24, 24), dtype=np.float32)
    vol[4:8, 6:12, 6:12] = rng.uniform(0.7, 1.0, (4, 6, 6)).astype(np.float32)
    vol = jnp.asarray(vol)
    # alpha zero for values below ~0.5, ramps above
    lut = np.zeros((8, 4), dtype=np.float32)
    lut[:, 0] = np.linspace(0, 1, 8)
    lut[5:, 3] = [0.3, 0.7, 1.0]
    tf = jnp.asarray(lut)
    o = jnp.asarray([0.0, 0.0, 4.0])
    kw = dict(width=128, height=128, n_planes=32, density=0.8)
    ref = np.asarray(slice_render_image(
        vol, o, kw["width"], kw["height"], tf, kw["density"],
        n_planes=kw["n_planes"]))
    with pltpu.force_tpu_interpret_mode():
        ess = np.asarray(pallas_slice_render(
            vol, o, tf, **kw, empty_space_skip=True))
        no_ess = np.asarray(pallas_slice_render(vol, o, tf, **kw))
    for got in (ess, no_ess):
        diff = np.abs(got - ref)
        assert np.quantile(diff, 0.999) < 1e-4
    assert ess.max() > 0  # the blob still renders

    # cached plane stats (the per-volume pass hoisted out of the frame):
    # bitwise-identical to the inline-computed bitmap render
    from vrdd_tpu.pallas.slice_kernel import precompute_ess_stats

    stats = precompute_ess_stats(vol, n_planes=kw["n_planes"])
    with pltpu.force_tpu_interpret_mode():
        cached = np.asarray(pallas_slice_render(
            vol, o, tf, **kw, empty_space_skip=True, ess_stats=stats))
    np.testing.assert_array_equal(cached, ess)


def test_pallas_banded_tall_image(monkeypatch):
    """Images taller than the resident-accumulator budget split into row
    bands (one executable, my0 traced); forcing 1-strip bands must reproduce
    the unbanded render exactly (rays are independent)."""
    import vrdd_tpu.pallas.slice_kernel as sk

    rng = np.random.default_rng(7)
    vol = jnp.asarray(rng.random((8, 16, 16), dtype=np.float32))
    tf = jnp.asarray(default_transfer_function())
    o = jnp.asarray([0.0, 0.0, 4.0])
    with pltpu.force_tpu_interpret_mode():
        full = np.asarray(pallas_slice_render(
            vol, o, tf, width=128, height=256, n_planes=16, density=0.4))
        monkeypatch.setattr(sk, "_max_band_rows", lambda w, n=9: sk.STRIP)
        banded = np.asarray(pallas_slice_render(
            vol, o, tf, width=128, height=256, n_planes=16, density=0.4))
    assert banded.shape == (256, 128, 4)
    np.testing.assert_array_equal(banded, full)


def test_pallas_flex_axis_scale_matches_slice():
    """Flexible-block queries (8/9/0) on the fused kernel: the scaled filter
    grid (axis_scale = n_blocks/(n_blocks+1) on the zero-padded grid — the
    CUDA unnormalized flexBlockTex fetch, volumeRender_kernel.cu:654-680)
    matches the XLA slice sweep with the same axis_scale."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(5)
    nzb, nyb, nxb = 6, 7, 5
    padded = jnp.asarray(np.pad(
        rng.random((nzb, nyb, nxb), dtype=np.float32),
        ((0, 1), (0, 1), (0, 1)),
    ))
    scale = (nxb / (nxb + 1), nyb / (nyb + 1), nzb / (nzb + 1))
    tf = jnp.asarray(default_transfer_function())
    o = jnp.asarray([0.0, 0.0, 4.0])
    ref = np.asarray(slice_render_image(
        padded, o, 64, 64, tf, 0.5, n_planes=64, axis_scale=scale,
    ))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pallas_slice_render(
            padded, o, tf, 0.5, width=64, height=64, n_planes=64,
            axis_scale=scale,
        ))
    diff = np.abs(got - ref)
    assert np.quantile(diff, 0.999) < 1e-4, np.quantile(diff, 0.999)


def test_empty_space_skip_with_axis_scale():
    """ESS + flexible-block filter scales: the bitmap's footprint math now
    carries the scaled texel mapping (u * N * s - tex_offset), so flex
    queries (8/9/0) benefit from TF-interval culling too. Skipping must stay
    EXACT: ESS == no-ESS bitwise-comparable on a sparse padded grid under a
    windowed TF."""
    rng = np.random.default_rng(11)
    nzb, nyb, nxb = 10, 12, 12
    grid = np.zeros((nzb, nyb, nxb), dtype=np.float32)
    grid[3:6, 4:9, 4:9] = rng.uniform(0.7, 1.0, (3, 5, 5)).astype(np.float32)
    padded = jnp.asarray(np.pad(grid, ((0, 1), (0, 1), (0, 1))))
    scale = (nxb / (nxb + 1), nyb / (nyb + 1), nzb / (nzb + 1))
    lut = np.zeros((8, 4), dtype=np.float32)
    lut[:, 0] = np.linspace(0, 1, 8)
    lut[5:, 3] = [0.3, 0.7, 1.0]
    tf = jnp.asarray(lut)
    o = jnp.asarray([0.0, 0.0, 4.0])
    kw = dict(width=128, height=128, n_planes=32, density=0.8,
              axis_scale=scale)
    with pltpu.force_tpu_interpret_mode():
        ess = np.asarray(pallas_slice_render(
            padded, o, tf, **kw, empty_space_skip=True))
        no_ess = np.asarray(pallas_slice_render(padded, o, tf, **kw))
    np.testing.assert_allclose(ess, no_ess, atol=1e-6)
    assert ess.max() > 0  # the blob still renders
    ref = np.asarray(slice_render_image(
        padded, o, kw["width"], kw["height"], tf, kw["density"],
        n_planes=kw["n_planes"], axis_scale=scale))
    assert np.quantile(np.abs(ess - ref), 0.999) < 1e-4
