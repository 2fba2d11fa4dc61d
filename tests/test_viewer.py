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


def _get_frame(server, path):
    """Fetch a frame following the pipelined-flush protocol (as the JS
    client does): while X-Frame-Lag is 1, re-request the same params to
    flush the in-flight frame; the returned bytes then CORRESPOND to the
    requested params."""
    for _ in range(5):
        status, body, headers = _get(server, path)
        if headers.get("X-Frame-Lag") != "1":
            break
    return status, body, headers


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
    _, body2, _ = _get_frame(server, "/frame?density=0.01&query=1")
    assert body2 != body


def test_plain_requests_keep_strict_contract(server):
    # a client NOT opting into pipelining (no pipe=1 — curl, screenshot
    # tools) always gets the frame for ITS params, never a lagged one
    _, a, ha = _get(server, "/frame?density=0.1&query=1")
    _, b, hb = _get(server, "/frame?density=0.9&query=1")
    assert ha.get("X-Frame-Lag") == "0" and hb.get("X-Frame-Lag") == "0"
    assert a != b


def test_frame_rotation_and_filter(server):
    _, a, _ = _get_frame(server, "/frame?rx=30&ry=40&density=0.5")
    _, b, _ = _get_frame(server, "/frame?rx=0&ry=0&density=0.5")
    assert a != b  # mouse-drag rotation re-renders
    # 'f' key: point vs linear filtering differ on a smooth volume
    _, lin, _ = _get_frame(server, "/frame?density=0.5&filter=1")
    _, pt, _ = _get_frame(server, "/frame?density=0.5&filter=0")
    assert lin != pt


def test_pipelined_lag_and_flush(server):
    # prime with params A (first-after-idle: served from the filling queue)
    _, a0, h0 = _get(server, "/frame?density=0.30&query=1&pipe=1")
    # params B: the response is an in-flight A-era frame, flagged lagged
    _, a1, h1 = _get(server, "/frame?density=0.31&query=1&pipe=1")
    assert h1.get("X-Frame-Lag") == "1"
    assert a1 == a0  # still the A frame (one-dispatch lag)
    # repeat B until the queue drains (the client's flush loop): the final
    # response is the B frame, unflagged
    b, h2 = a1, h1
    for _ in range(5):
        _, b, h2 = _get(server, "/frame?density=0.31&query=1&pipe=1")
        if h2.get("X-Frame-Lag") != "1":
            break
    assert h2.get("X-Frame-Lag") == "0"
    assert b != a0


def test_rgb_frame_format(server):
    _, body, _ = _get_frame(server, "/frame?density=0.5&query=1&fmt=rgb")
    assert len(body) == W * H * 3
    img = np.frombuffer(body, dtype=np.uint8).reshape(H, W, 3)
    assert img.max() > 0
    # RGB bytes must equal the RGBA frame's first three channels
    _, body4, _ = _get_frame(server, "/frame?density=0.5&query=1")
    rgba = np.frombuffer(body4, dtype=np.uint8).reshape(H, W, 4)
    np.testing.assert_array_equal(img, rgba[..., :3])


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


def test_concurrent_clients(server):
    """Two clients (pipelined tab + plain poller) hammer the server
    concurrently: every response must be well-formed and the plain
    client's responses must never be lagged (per-call header, shared
    render lock)."""
    import threading

    errors = []

    def pipelined_tab():
        try:
            for i in range(6):
                s, body, h = _get(
                    server, f"/frame?density={0.2 + 0.01 * i:.2f}&pipe=1"
                )
                assert s == 200 and len(body) == W * H * 4
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def plain_poller():
        try:
            for i in range(6):
                s, body, h = _get(
                    server, f"/frame?density={0.6 + 0.01 * i:.2f}"
                )
                assert s == 200 and len(body) == W * H * 4
                assert h.get("X-Frame-Lag") == "0"
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=pipelined_tab),
               threading.Thread(target=plain_poller)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors
