"""Interactive viewer server: page + frame endpoint + parameter plumbing.

The viewer replaces the reference's GLUT interaction loop
(volumeRender.cpp:194-295, 302-432); these tests drive its HTTP surface the
way the browser page does.
"""

import urllib.request

import numpy as np
import jax.numpy as jnp
import pytest

from vrdd_tpu.io.synthetic import random_histogram_volume
from vrdd_tpu.models.pipeline import RenderPipeline
from vrdd_tpu.models.volumes import RawHistogramVolume
from vrdd_tpu.viewer import ViewerServer

W = H = 64


@pytest.fixture(scope="module")
def server():
    hist = random_histogram_volume((4, 8, 8), n_bins=32, seed=0)
    pipeline = RenderPipeline(raw=RawHistogramVolume(jnp.asarray(hist)))
    srv = ViewerServer(pipeline, width=W, height=H, port=0)  # ephemeral port
    srv.start_background()
    yield srv
    srv.shutdown()


def _get(server, path):
    url = server.address.rstrip("/") + path
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, r.read(), dict(r.headers)


def test_page_serves(server):
    status, body, _ = _get(server, "/")
    assert status == 200
    assert b"canvas" in body and b"keydown" in body


def test_frame_shape_and_params(server):
    status, body, headers = _get(server, "/frame?density=0.5&query=1")
    assert status == 200
    assert len(body) == W * H * 4
    assert float(headers["X-Render-Seconds"]) > 0
    img = np.frombuffer(body, dtype=np.uint8).reshape(H, W, 4)
    assert img.max() > 0  # something rendered

    # density changes the image (the reference's +/- keys)
    _, body2, _ = _get(server, "/frame?density=0.01&query=1")
    assert body2 != body


def test_frame_rotation_and_filter(server):
    _, a, _ = _get(server, "/frame?rx=30&ry=40&density=0.5")
    _, b, _ = _get(server, "/frame?rx=0&ry=0&density=0.5")
    assert a != b  # mouse-drag rotation re-renders
    # 'f' key: point vs linear filtering differ on a smooth volume
    _, lin, _ = _get(server, "/frame?density=0.5&filter=1")
    _, pt, _ = _get(server, "/frame?density=0.5&filter=0")
    assert lin != pt


def test_frame_bad_query_is_500(server):
    status, body, _ = _get_raise_ok(server, "/frame?query=8")
    assert status == 500  # no flexible volume loaded -> clean JSON error
    assert b"error" in body


def _get_raise_ok(server, path):
    import urllib.error

    try:
        return _get(server, path)
    except urllib.error.HTTPError as e:
        return e.code, e.read(), dict(e.headers)
