"""In-kernel distribution decode: the fused sweep consuming bins-major
histogram volumes directly (slice_kernel.py pallas_hist_render /
slice_vjp.py pallas_hist_render_diff).

The decoded scalar volume never exists in HBM in either direction — the
plane prologue contracts sum_b w[b] * hist[b] in VMEM (the reference's
query-7 in-march decode, volumeRender_kernel.cu:354-480, generalized to
any LINEAR bins->scalar statistic on the fused MXU sweep). Pinned under
the Mosaic interpreter against decode-everything-first."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from vrdd_tpu.core.transfer import default_transfer_function
from vrdd_tpu.march.slice import slice_render_image
from vrdd_tpu.pallas.slice_kernel import (
    hist_render_supported,
    pallas_hist_render,
)
from vrdd_tpu.pallas.slice_vjp import pallas_hist_render_diff

TF = jnp.asarray(default_transfer_function())
O = jnp.asarray([0.0, 0.0, 4.0])
W = H = 128


def _hist(nz=16, B=8, seed=0):
    rng = np.random.default_rng(seed)
    h = rng.random((nz, B, nz, nz)).astype(np.float32)
    h /= h.sum(axis=1, keepdims=True)
    w = (np.arange(B, dtype=np.float32) + 0.5) / B
    return jnp.asarray(h), jnp.asarray(w)


def test_hist_render_supported():
    assert hist_render_supported((16, 8, 16, 16), 128, 128)
    assert not hist_render_supported((16, 8, 16, 16), 100, 128)  # tiling
    assert not hist_render_supported((16, 4096, 1024, 1024), 128, 128)


def test_forward_matches_materialized():
    hist, w = _hist()
    decoded = jnp.einsum("zbyx,b->zyx", hist, w)
    ref = np.asarray(slice_render_image(decoded, O, W, H, TF, n_planes=16))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            pallas_hist_render(hist, w, O, TF, width=W, height=H)
        )
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_grads_match_materialized():
    hist, w = _hist(seed=3)

    def loss_hist(h, w_, lut):
        img = pallas_hist_render_diff(
            h, w_, O, lut, width=W, height=H,
            wrt=("hist", "weights", "lut", "params"), density=0.08,
        )
        return jnp.sum(img ** 2)

    def loss_ref(h, w_, lut):
        dec = jnp.einsum("zbyx,b->zyx", h, w_)
        img = slice_render_image(
            dec, O, W, H, lut, n_planes=16, density=0.08,
            use_custom_vjp=False,
        )
        return jnp.sum(img ** 2)

    with pltpu.force_tpu_interpret_mode():
        v_h, (gh, gw, gl) = jax.value_and_grad(
            loss_hist, argnums=(0, 1, 2)
        )(hist, w, TF)
    v_r, (gh_r, gw_r, gl_r) = jax.value_and_grad(
        loss_ref, argnums=(0, 1, 2)
    )(hist, w, TF)

    def mre(a, b):
        s = float(jnp.max(jnp.abs(b))) or 1.0
        return float(jnp.max(jnp.abs(a - b))) / s

    assert abs(float(v_h - v_r)) / abs(float(v_r)) < 1e-5
    assert mre(gh, gh_r) < 1e-4, "histogram cotangent"
    assert mre(gw, gw_r) < 1e-4, "decode-weight (template) cotangent"
    # LUT grads accumulate in the tent basis with a different float
    # association than XLA's transpose; 2e-4 matches test_pallas_vjp's
    # established tolerance for the same comparison
    assert mre(gl, gl_r) < 5e-4, "LUT cotangent"


def test_wrt_pruning_returns_zeros():
    hist, w = _hist(seed=5)

    def loss(h, w_):
        img = pallas_hist_render_diff(
            h, w_, O, TF, width=W, height=H, wrt=("lut",)
        )
        return jnp.sum(img ** 2)

    with pltpu.force_tpu_interpret_mode():
        gh, gw = jax.grad(loss, argnums=(0, 1))(hist, w)
    assert float(jnp.max(jnp.abs(gh))) == 0.0
    assert float(jnp.max(jnp.abs(gw))) == 0.0


def test_early_termination_matches():
    # saturating density: the kernel's tile ET must agree with the
    # sequential reference through the in-kernel decode
    hist, w = _hist(seed=7)
    decoded = jnp.einsum("zbyx,b->zyx", hist, w)
    ref = np.asarray(
        slice_render_image(decoded, O, W, H, TF, density=5.0, n_planes=16)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            pallas_hist_render(hist, w, O, TF, density=5.0, width=W, height=H)
        )
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_bf16_histogram_storage():
    """bf16-stored distribution volume: 2x stream bandwidth; decode
    accuracy equals the materialized path's bf16 decode matmul, and the
    histogram cotangent comes back in the storage dtype."""
    hist, w = _hist(seed=9)
    h16 = hist.astype(jnp.bfloat16)
    decoded = jnp.einsum("zbyx,b->zyx", hist, w)
    ref = np.asarray(slice_render_image(decoded, O, W, H, TF, n_planes=16))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            pallas_hist_render(h16, w, O, TF, width=W, height=H)
        )
        def loss(h, lut):
            img = pallas_hist_render_diff(
                h, w, O, lut, width=W, height=H, wrt=("hist", "lut")
            )
            return jnp.sum(img ** 2)
        gh = jax.grad(loss)(h16, TF)
        g32 = jax.grad(loss)(hist, TF)
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=1e-2)
    assert gh.dtype == jnp.bfloat16
    num = float(jnp.sum(gh.astype(jnp.float32) * g32))
    den = float(jnp.linalg.norm(gh.astype(jnp.float32))
                * jnp.linalg.norm(g32))
    assert num / den > 0.999, "bf16 grads must point with the f32 grads"


def test_non_pow2_volume_dims():
    """The in-kernel decode only constrains the IMAGE tiling; volume and
    bin extents are free (matmul contraction dims)."""
    rng = np.random.default_rng(11)
    nz, B, ny, nx = 12, 5, 20, 24
    h = rng.random((nz, B, ny, nx)).astype(np.float32)
    h /= h.sum(axis=1, keepdims=True)
    hist = jnp.asarray(h)
    w = jnp.asarray((np.arange(B, dtype=np.float32) + 0.5) / B)
    decoded = jnp.einsum("zbyx,b->zyx", hist, w)
    ref = np.asarray(
        slice_render_image(decoded, O, W, H, TF, n_planes=nz)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            pallas_hist_render(hist, w, O, TF, width=W, height=H)
        )
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


# ---- nonlinear in-kernel stats (reference queries 2/3 semantics) ----

from vrdd_tpu.ops.histogram import raw_block_stats
from vrdd_tpu.pallas.slice_kernel import decode_weight_rows
from vrdd_tpu.utils.config import N_BINS


def _hist32(nz=16, seed=0):
    rng = np.random.default_rng(seed)
    h = rng.random((nz, N_BINS, nz, nz)).astype(np.float32)
    h /= h.sum(axis=1, keepdims=True)
    return jnp.asarray(h)


# var decodes to ~2 after /VARIANCE_NORM — window the TF (transfer_scale)
# so the statistic lands mid-ramp instead of clipping to the black end knot
@pytest.mark.parametrize("stat,chan,tscl", [("mean", 0, 1.0),
                                            ("var", 1, 0.3),
                                            ("entropy", 2, 1.0)])
def test_nonlinear_stats_match_materialized(stat, chan, tscl):
    """In-kernel var/entropy decode == raw_block_stats through the sweep:
    the reference's query 1/2/3 statistics (volumeRender_kernel.cu:742-769)
    computed inside the kernel prologue, pinned against the materialized
    decode-everything-first path."""
    hist = _hist32(seed=13)
    rows, mode = decode_weight_rows(stat, N_BINS, family="raw")
    # materialized reference: decode the (z, y, x, B) volume, select channel
    decoded = raw_block_stats(
        jnp.moveaxis(hist, 1, -1), channels=(chan,)
    )[..., 0]
    ref = np.asarray(
        slice_render_image(decoded, O, W, H, TF, n_planes=16, density=0.3,
                           transfer_scale=tscl)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            pallas_hist_render(hist, rows, O, TF, width=W, height=H,
                               density=0.3, transfer_scale=tscl, stat=mode)
        )
    assert np.abs(ref).max() > 1e-3, "vacuous comparison: image is black"
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("stat,chan,tscl", [("var", 1, 0.3),
                                            ("entropy", 2, 1.0)])
def test_nonlinear_grads_match_materialized(stat, chan, tscl):
    """Histogram + LUT cotangents through the nonlinear in-kernel decode
    (backward replays the prologue; the jacobian chain runs fused outside)
    vs autodiff through the materialized raw_block_stats pipeline."""
    hist = _hist32(seed=17)
    rows, mode = decode_weight_rows(stat, N_BINS, family="raw")

    def loss_hist(h, lut):
        img = pallas_hist_render_diff(
            h, rows, O, lut, width=W, height=H, wrt=("hist", "lut"),
            density=0.3, transfer_scale=tscl, stat=mode,
        )
        return jnp.sum(img ** 2)

    def loss_ref(h, lut):
        dec = raw_block_stats(jnp.moveaxis(h, 1, -1),
                              channels=(chan,))[..., 0]
        img = slice_render_image(
            dec, O, W, H, lut, n_planes=16, density=0.3,
            transfer_scale=tscl, use_custom_vjp=False,
        )
        return jnp.sum(img ** 2)

    with pltpu.force_tpu_interpret_mode():
        v_h, (gh, gl) = jax.value_and_grad(
            loss_hist, argnums=(0, 1)
        )(hist, TF)
    v_r, (gh_r, gl_r) = jax.value_and_grad(loss_ref, argnums=(0, 1))(hist, TF)

    def mre(a, b):
        s = float(jnp.max(jnp.abs(b))) or 1.0
        return float(jnp.max(jnp.abs(a - b))) / s

    assert abs(float(v_h - v_r)) / abs(float(v_r)) < 1e-5
    assert mre(gh, gh_r) < 5e-4, "histogram cotangent"
    assert mre(gl, gl_r) < 5e-4, "LUT cotangent"


def test_entropy_zero_bins_gradient():
    """Exact-zero bins: forward term is 0 and the cotangent is 0 (matching
    histogram_entropy's safe-log), never inf/nan."""
    nz = 16
    rng = np.random.default_rng(23)
    h = rng.random((nz, 8, nz, nz)).astype(np.float32)
    h[:, 3] = 0.0  # a bin that is exactly zero everywhere
    h /= h.sum(axis=1, keepdims=True)
    hist = jnp.asarray(h)
    rows, mode = decode_weight_rows("entropy", 8)

    def loss(hh):
        img = pallas_hist_render_diff(
            hh, rows, O, TF, width=W, height=H, wrt=("hist",), density=0.3,
            stat=mode,
        )
        return jnp.sum(img ** 2)

    with pltpu.force_tpu_interpret_mode():
        gh = jax.grad(loss)(hist)
    gh = np.asarray(gh)
    assert np.all(np.isfinite(gh))
    assert np.all(gh[:, 3] == 0.0), "zero bins must get zero cotangent"


@pytest.mark.parametrize("stat", ["linear", "var", "entropy"])
def test_materialized_route_matches_inkernel(stat):
    """pallas_hist_render_diff(route='materialized') — the decode-with-XLA
    + scalar-VJP implementation the headline bench A/Bs against the
    in-kernel route — must agree in value and gradients (off-TPU both
    decodes are exact f32, so tolerances are tight; on TPU the
    materialized decode matmul carries the documented ~1e-3 bf16
    rounding)."""
    from vrdd_tpu.pallas.slice_kernel import decode_weight_rows

    hist, w = _hist(seed=9)
    if stat == "linear":
        rows = w
    else:
        rows = jnp.asarray(decode_weight_rows(stat, 8, family="unit")[0])
    tscl = 30.0 if stat == "var" else 1.0

    def loss(h, lut, route):
        img = pallas_hist_render_diff(
            h, rows, O, lut, width=W, height=H, wrt=("hist", "lut"),
            density=0.08, transfer_scale=tscl, stat=stat, route=route,
        )
        return jnp.sum(img ** 2)

    with pltpu.force_tpu_interpret_mode():
        v_i, (gh_i, gl_i) = jax.value_and_grad(
            lambda h, l: loss(h, l, "inkernel"), argnums=(0, 1))(hist, TF)
        v_m, (gh_m, gl_m) = jax.value_and_grad(
            lambda h, l: loss(h, l, "materialized"), argnums=(0, 1))(hist, TF)

    def mre(a, b):
        s = float(jnp.max(jnp.abs(b))) or 1.0
        return float(jnp.max(jnp.abs(a - b))) / s

    assert abs(float(v_i - v_m)) / (abs(float(v_m)) or 1.0) < 1e-5
    assert mre(gh_i, gh_m) < 5e-4
    assert mre(gl_i, gl_m) < 5e-4


def test_live_fractions_reports_culling():
    """live_fractions (roofline v2's measured-culling input): full coverage
    on a transparent volume reports ~all tiles live; an opaque volume
    under a saturating density must report tiles dying off front-to-back
    (fraction strictly below 1)."""
    from vrdd_tpu.pallas.slice_vjp import live_fractions

    nz = 16
    rng = np.random.default_rng(4)
    vol = jnp.asarray(rng.random((nz, nz, nz), dtype=np.float32))
    with pltpu.force_tpu_interpret_mode():
        lf_thin = live_fractions(
            vol, O, TF, density=0.01, width=W, height=H, n_planes=nz)
        # 0.7 maps into the ramp's opaque band (the default TF's last
        # entry has alpha 0, so 1.0 would render nothing)
        lf_opaque = live_fractions(
            vol * 0.0 + 0.7, O, TF, density=5.0, width=W, height=H,
            n_planes=nz)
    assert 0.0 < lf_thin["tile_live_frac"] <= 1.0
    assert lf_thin["strip_live_frac"] >= lf_thin["tile_live_frac"]
    assert lf_opaque["tile_live_frac"] < lf_thin["tile_live_frac"]
    assert lf_opaque["tile_live_frac"] < 0.9


def test_route_auto_policy_and_parity():
    """route='auto' resolves to the measured-best implementation (BENCH r5):
    materialized for small/medium linear stats, inkernel for entropy — and
    its value matches the explicit routes."""
    hist, w = _hist(seed=11)

    def loss(h, route, stat, rows):
        img = pallas_hist_render_diff(
            h, rows, O, TF, width=W, height=H, wrt=("hist",), stat=stat,
            route=route,
        )
        return jnp.sum(img ** 2)

    with pltpu.force_tpu_interpret_mode():
        v_auto = float(loss(hist, "auto", "linear", w))
        v_mat = float(loss(hist, "materialized", "linear", w))
        from vrdd_tpu.pallas.slice_kernel import decode_weight_rows

        erows = jnp.asarray(decode_weight_rows("entropy", 8, family="unit")[0])
        e_auto = float(loss(hist, "auto", "entropy", erows))
        e_ik = float(loss(hist, "inkernel", "entropy", erows))
    assert abs(v_auto - v_mat) / (abs(v_mat) or 1.0) < 1e-6
    assert abs(e_auto - e_ik) / (abs(e_ik) or 1.0) < 1e-6
