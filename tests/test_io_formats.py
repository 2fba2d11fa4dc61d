"""Round-trip tests of all binary formats; Python and native readers agree."""

import numpy as np
import pytest

from vrdd_tpu.io import formats
from vrdd_tpu.io import native


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_raw_roundtrip(tmp_path, rng):
    h = rng.random((100, 32)).astype(np.float32)
    p = str(tmp_path / "raw.bin")
    formats.write_raw_histograms(p, h)
    np.testing.assert_array_equal(formats.read_raw_histograms(p, 100, 32), h)


def test_codebook_roundtrip(tmp_path, rng):
    n, nb, E = 50, 32, 8
    cb = np.stack(
        [
            rng.integers(0, 600, n),
            rng.integers(0, nb, n),
            rng.integers(0, 2, n),
            rng.integers(0, E + 1, n),
        ],
        -1,
    ).astype(np.int32)
    # unique bin ids per histogram: duplicates are rejected by the reader
    # (the single-clamp decode requires them unique; see read_codebook)
    ebins = np.stack(
        [rng.permutation(nb)[:E] for _ in range(n)]
    ).astype(np.int32)
    evals = rng.uniform(-1, 1, (n, E)).astype(np.float32)
    span_ids = np.arange(n, dtype=np.int32)
    # zero out padding so comparisons are exact
    for i in range(n):
        ebins[i, cb[i, 3]:] = 0
        evals[i, cb[i, 3]:] = 0
    p = str(tmp_path / "cb.bin")
    formats.write_codebook(p, cb, ebins, evals, span_ids)
    cb2, eb2, ev2, sid2 = formats.read_codebook(p, nb, E)
    np.testing.assert_array_equal(cb2, cb)
    np.testing.assert_array_equal(eb2, ebins)
    np.testing.assert_allclose(ev2, evals, rtol=1e-6)
    np.testing.assert_array_equal(sid2, span_ids)


def test_templates_roundtrip(tmp_path, rng):
    t = rng.random((20, 32)).astype(np.float32)
    t /= t.max() + 1.0  # keep in [0, 1]
    p = str(tmp_path / "templates.bin")
    formats.write_templates(p, t)
    np.testing.assert_allclose(formats.read_templates(p, 32), t, rtol=1e-6)


def test_templates_validation(tmp_path):
    t = np.array([[0.5, 1.5]], dtype=np.float32)  # out of range
    p = str(tmp_path / "bad.bin")
    formats.write_templates(p, t)
    with pytest.raises(formats.FormatError):
        formats.read_templates(p, 2)


def test_span_list_roundtrip_interleaved(tmp_path, rng):
    low = rng.integers(0, 30, (40, 3)).astype(np.int32)
    high = low + rng.integers(0, 30, (40, 3)).astype(np.int32)
    p = str(tmp_path / "spans.bin")
    formats.write_span_list(p, low, high)
    lo2, hi2 = formats.read_span_list(p)
    np.testing.assert_array_equal(lo2, low)
    np.testing.assert_array_equal(hi2, high)
    # verify the on-disk interleave quirk directly
    raw = np.fromfile(p, dtype="<i4")[1:].reshape(-1, 6)
    np.testing.assert_array_equal(raw[:, 0], low[:, 0])
    np.testing.assert_array_equal(raw[:, 1], high[:, 0])
    np.testing.assert_array_equal(raw[:, 4], low[:, 2])


def test_simple_histograms_roundtrip(tmp_path, rng):
    n, nb = 30, 64
    low = rng.integers(0, 60, (n, 3)).astype(np.int32)
    high = low + rng.integers(0, 3, (n, 3)).astype(np.int32)
    counts = rng.integers(1, 6, n).astype(np.int32)
    bin_ids = np.zeros((n, nb), dtype=np.int32)
    freqs = np.zeros((n, nb), dtype=np.float32)
    for i in range(n):
        ids = rng.choice(nb, counts[i], replace=False)
        fr = rng.random(counts[i]).astype(np.float64)
        fr /= fr.sum()
        bin_ids[i, : counts[i]] = ids
        freqs[i, : counts[i]] = fr
    paths = [str(tmp_path / f) for f in ("c.bin", "i.bin", "f.bin")]
    formats.write_simple_histograms(*paths, low, high, bin_ids, freqs, counts)
    lo2, hi2, bi2, fr2, c2 = formats.read_simple_histograms(*paths, nb)
    np.testing.assert_array_equal(lo2, low)
    np.testing.assert_array_equal(hi2, high)
    np.testing.assert_array_equal(c2, counts)
    np.testing.assert_array_equal(bi2, bin_ids)
    np.testing.assert_allclose(fr2, freqs, rtol=1e-6)


def test_ppm_roundtrip_and_compare(tmp_path, rng):
    img = rng.integers(0, 256, (16, 20, 4)).astype(np.uint8)
    p = str(tmp_path / "img.ppm")
    formats.write_ppm(p, img)
    back = formats.read_ppm(p)
    np.testing.assert_array_equal(back, img[..., :3])
    ok, frac = formats.compare_ppm(back, img[..., :3])
    assert ok and frac == 0.0
    noisy = back.astype(np.int32).copy()
    noisy[:8] += 50  # half the rows badly off -> 50% outliers > 30%
    ok2, frac2 = formats.compare_ppm(noisy, back)
    assert not ok2 and frac2 == 0.5


@pytest.mark.skipif(not native.available(), reason="native toolchain missing")
class TestNativeParity:
    def test_native_matches_python(self, tmp_path, rng):
        # codebook
        n, nb, E = 25, 64, 6
        cb = np.stack(
            [
                rng.integers(0, 400, n),
                rng.integers(0, nb, n),
                rng.integers(0, 2, n),
                rng.integers(0, E + 1, n),
            ],
            -1,
        ).astype(np.int32)
        ebins = np.stack(
            [rng.permutation(nb)[:E] for _ in range(n)]
        ).astype(np.int32)
        evals = rng.uniform(-1, 1, (n, E)).astype(np.float32)
        sids = rng.integers(0, 1000, n).astype(np.int32)
        for i in range(n):
            ebins[i, cb[i, 3]:] = 0
            evals[i, cb[i, 3]:] = 0
        p = str(tmp_path / "cb.bin")
        formats.write_codebook(p, cb, ebins, evals, sids)
        for a, b in zip(formats.read_codebook(p, nb, E), native.read_codebook(p, nb, E)):
            np.testing.assert_allclose(a, b, rtol=1e-6)

        # templates
        t = (rng.random((10, nb)) * 0.9).astype(np.float32)
        pt = str(tmp_path / "t.bin")
        formats.write_templates(pt, t)
        np.testing.assert_allclose(
            native.read_templates(pt, nb), formats.read_templates(pt, nb), rtol=1e-6
        )

        # span list
        low = rng.integers(0, 30, (15, 3)).astype(np.int32)
        high = low + rng.integers(0, 30, (15, 3)).astype(np.int32)
        ps = str(tmp_path / "s.bin")
        formats.write_span_list(ps, low, high)
        for a, b in zip(formats.read_span_list(ps), native.read_span_list(ps)):
            np.testing.assert_array_equal(a, b)

        # raw
        h = rng.random((40, nb)).astype(np.float32)
        pr = str(tmp_path / "r.bin")
        formats.write_raw_histograms(pr, h)
        np.testing.assert_array_equal(native.read_raw_histograms(pr, 40, nb), h)

        # simple trio
        counts = rng.integers(1, 5, 12).astype(np.int32)
        bin_ids = np.zeros((12, nb), dtype=np.int32)
        freqs = np.zeros((12, nb), dtype=np.float32)
        for i in range(12):
            ids = rng.choice(nb, counts[i], replace=False)
            fr = rng.random(counts[i]).astype(np.float64)
            fr /= fr.sum()
            bin_ids[i, : counts[i]] = ids
            freqs[i, : counts[i]] = fr
        lo = rng.integers(0, 60, (12, 3)).astype(np.int32)
        hi = lo + 1
        paths = [str(tmp_path / f) for f in ("sc.bin", "si.bin", "sf.bin")]
        formats.write_simple_histograms(*paths, lo, hi, bin_ids, freqs, counts)
        py = formats.read_simple_histograms(*paths, nb)
        nat = native.read_simple_histograms(*paths, nb)
        for a, b in zip(py, nat):
            np.testing.assert_allclose(a, b, rtol=1e-6)

    def test_native_validation(self, tmp_path):
        t = np.array([[0.5, 1.5]], dtype=np.float32)
        p = str(tmp_path / "bad.bin")
        formats.write_templates(p, t)
        with pytest.raises(formats.FormatError):
            native.read_templates(p, 2)


def _dup_codebook(path, dup: bool, oob: bool = False):
    nb = 32
    cb = np.asarray([[3, 5, 0, 2]], dtype=np.int32)
    bins = np.asarray([[7, 7 if dup else 9]], dtype=np.int32)
    if oob:
        bins = np.asarray([[7, nb]], dtype=np.int32)
    vals = np.asarray([[0.1, -0.1]], dtype=np.float32)
    formats.write_codebook(path, cb, bins, vals, np.asarray([0], np.int32))
    return nb


def test_codebook_duplicate_bins_rejected(tmp_path):
    """Duplicate sparse-error bin ids are rejected: the single-clamp decode
    (ops/fractal.py) is only equivalent to the reference's
    clamp-after-each-add (volumeRender_kernel.cu:817-825) for unique bins."""
    p = str(tmp_path / "dup.bin")
    nb = _dup_codebook(p, dup=True)
    with pytest.raises(formats.FormatError, match="duplicate"):
        formats.read_codebook(p, nb, 2)
    p2 = str(tmp_path / "oob.bin")
    nb = _dup_codebook(p2, dup=False, oob=True)
    with pytest.raises(formats.FormatError, match="out of"):
        formats.read_codebook(p2, nb, 2)
    # unique ids still load
    p3 = str(tmp_path / "ok.bin")
    nb = _dup_codebook(p3, dup=False)
    cb, eb, ev, sid = formats.read_codebook(p3, nb, 2)
    assert eb.tolist() == [[7, 9]]


@pytest.mark.skipif(not native.available(), reason="native toolchain missing")
def test_native_codebook_duplicate_bins_rejected(tmp_path):
    p = str(tmp_path / "dup.bin")
    nb = _dup_codebook(p, dup=True)
    with pytest.raises(formats.FormatError):
        native.read_codebook(p, nb, 2)


@pytest.mark.skipif(not native.available(), reason="native toolchain missing")
def test_native_ppm_matches_python(tmp_path):
    """Native PPM write/read/compare == the Python spec (the reference's
    sdkSavePPM4ub/sdkComparePPM path, volumeRender.cpp:1073-1083)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(17, 23, 4), dtype=np.uint8)
    p_native = str(tmp_path / "n.ppm")
    p_python = str(tmp_path / "p.ppm")
    native.write_ppm(p_native, img)
    formats.write_ppm(p_python, img)
    assert open(p_native, "rb").read() == open(p_python, "rb").read()
    np.testing.assert_array_equal(
        native.read_ppm(p_native), formats.read_ppm(p_python)
    )

    # compare: identical passes with 0 outliers; perturbed image's outlier
    # fraction matches the Python spec exactly
    ok, frac = native.compare_ppm(img[..., :3], p_python)
    assert ok and frac == 0.0
    noisy = img[..., :3].astype(np.int32)
    noisy[::3, ::2] += 37
    noisy = np.clip(noisy, 0, 255).astype(np.uint8)
    ok_n, frac_n = native.compare_ppm(noisy, p_python)
    ok_p, frac_p = formats.compare_ppm(noisy, formats.read_ppm(p_python))
    assert (ok_n, frac_n) == (ok_p, frac_p)

    # header with comments still parses
    pc = str(tmp_path / "c.ppm")
    with open(pc, "wb") as fp:
        fp.write(b"P6\n# a comment\n23 17\n255\n")
        fp.write(np.ascontiguousarray(img[..., :3]).tobytes())
    np.testing.assert_array_equal(native.read_ppm(pc), img[..., :3])


def test_bins_major_histogram_load(tmp_path):
    """Bins-major load (the in-kernel decode's device layout): Python spec
    and native C++ loader agree, in f32 and bf16, against a hand-built
    voxel-major blob."""
    import ml_dtypes

    from vrdd_tpu.io import native
    from vrdd_tpu.io.formats import (
        read_histograms_bins_major,
        read_raw_histograms,
    )

    rng = np.random.default_rng(3)
    nz, ny, nx, B = 3, 4, 5, 8
    flat = rng.random((nz * ny * nx, B)).astype(np.float32)
    path = str(tmp_path / "hist.bin")
    flat.tofile(path)

    want = flat.reshape(nz, ny, nx, B).transpose(0, 3, 1, 2)
    got = read_histograms_bins_major(path, (nz, ny, nx), B, dtype="float32")
    assert got.shape == (nz, B, ny, nx)
    np.testing.assert_array_equal(got, want)
    got16 = read_histograms_bins_major(path, (nz, ny, nx), B)
    assert got16.dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(
        got16, want.astype(ml_dtypes.bfloat16)
    )

    if native.available():
        ngot = native.read_histograms_bins_major(
            path, (nz, ny, nx), B, dtype="float32"
        )
        np.testing.assert_array_equal(ngot, want)
        ngot16 = native.read_histograms_bins_major(path, (nz, ny, nx), B)
        assert ngot16.dtype == ml_dtypes.bfloat16
        # C++ rounds to nearest even exactly like numpy's cast
        np.testing.assert_array_equal(
            ngot16.view(np.uint16),
            want.astype(ml_dtypes.bfloat16).view(np.uint16),
        )
    # round-trip sanity vs the flat reader
    np.testing.assert_array_equal(
        read_raw_histograms(path, nz * ny * nx, B), flat
    )
