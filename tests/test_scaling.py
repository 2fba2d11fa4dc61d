"""Pod scaling harness pinned functional on the 8-device virtual mesh.

Efficiency NUMBERS are meaningless here (8 virtual devices share one
host's cores), but the harness — mesh factoring, volume bricking, the
1-device vs N-device timing pair, the efficiency arithmetic — must run
end to end so ``python bench.py --sections scaling`` works unmodified the
day real multi-chip hardware is attached (BASELINE.md: >= 80% linear at
2+ hosts)."""

import jax
import pytest

from vrdd_tpu.parallel.scaling import _factor_mesh, measure_scaling


def test_factor_mesh():
    assert _factor_mesh(1) == (1, 1)
    assert _factor_mesh(2) == (1, 2)
    assert _factor_mesh(4) == (2, 2)
    assert _factor_mesh(8) == (2, 4)
    assert _factor_mesh(6) == (2, 3)


def test_measure_scaling_virtual_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    out = measure_scaling(jax.devices()[:8], size=16, image=64, iters=1)
    assert out["scaling_n_devices"] == 8
    assert out["scaling_mesh"] == "bricks=2 x rays=4"
    assert out["scaling_t1_ms"] > 0 and out["scaling_tN_ms"] > 0
    assert out["scaling_efficiency"] is not None
    assert out["scaling_efficiency"] > 0
    # the TRAINING-step pair (BASELINE.json: gradients all-reduced
    # overlapped with the backward) runs on both meshes too
    assert out["scaling_fwdbwd_t1_ms"] > 0
    assert out["scaling_fwdbwd_tN_ms"] > 0
    assert out["scaling_fwdbwd_efficiency"] > 0


def test_measure_scaling_single_device_reports_armed():
    out = measure_scaling(jax.devices()[:1], size=16, image=64, iters=1)
    assert out["scaling_n_devices"] == 1
    assert out["scaling_efficiency"] is None
    assert out["scaling_fwdbwd_efficiency"] is None
    assert out["scaling_fwdbwd_t1_ms"] > 0
    assert "ready" in out["scaling_note"]
