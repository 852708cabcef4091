"""Native C++ LAPJV vs scipy and vs the on-device solver."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from poet_tpu.native import lapjv


def test_lapjv_matches_scipy(rng):
    for n in (2, 5, 10, 33, 64):
        cost = rng.normal(size=(n, n)) * 10
        col = lapjv(cost)
        ri, ci = linear_sum_assignment(cost)
        assert sorted(col.tolist()) == list(range(n))
        np.testing.assert_allclose(
            cost[np.arange(n), col].sum(), cost[ri, ci].sum(), rtol=1e-12
        )


def test_lapjv_batch(rng):
    costs = rng.uniform(size=(6, 12, 12))
    cols = lapjv(costs)
    for b in range(6):
        ri, ci = linear_sum_assignment(costs[b])
        np.testing.assert_allclose(
            costs[b][np.arange(12), cols[b]].sum(), costs[b][ri, ci].sum(), rtol=1e-12
        )


def test_lapjv_matches_device_solver(rng):
    """C++ host solver and the in-jit JV must agree on the optimum."""
    import jax.numpy as jnp
    from poet_tpu.ops.hungarian import hungarian

    cost = rng.normal(size=(4, 10, 10)).astype(np.float32)
    host = lapjv(cost.astype(np.float64))
    dev = np.asarray(hungarian(jnp.asarray(cost)))
    for b in range(4):
        h = cost[b][np.arange(10), host[b]].sum()
        d = cost[b][np.arange(10), dev[b]].sum()
        np.testing.assert_allclose(h, d, rtol=1e-5)


# ---------------------------------------------------------------------------
# imagepipe (C++ libpng/libjpeg decode)
# ---------------------------------------------------------------------------

from io import BytesIO

from PIL import Image

from poet_tpu import native


def _enc(arr, fmt, mode):
    b = BytesIO()
    Image.fromarray(arr, mode).save(b, fmt)
    return b.getvalue()


@pytest.fixture(scope="module")
def imagepipe():
    if not native.imagepipe_available():
        pytest.skip("native imagepipe unavailable")
    return native


def test_decode_png_rgb_exact(imagepipe, rng):
    a = (rng.uniform(size=(48, 64, 3)) * 255).astype(np.uint8)
    blob = _enc(a, "PNG", "RGB")
    assert native.probe_image(blob) == (48, 64, 3)
    np.testing.assert_array_equal(native.decode_image(blob), a)


def test_decode_png_rgba_pil_semantics(imagepipe, rng):
    """RGB decode of an RGBA PNG drops alpha (PIL convert('RGB')), and RGBA
    decode is exact."""
    a = (rng.uniform(size=(48, 64, 4)) * 255).astype(np.uint8)
    blob = _enc(a, "PNG", "RGBA")
    assert native.probe_image(blob) == (48, 64, 4)
    pil_rgb = np.asarray(Image.open(BytesIO(blob)).convert("RGB"))
    np.testing.assert_array_equal(native.decode_image(blob, 3), pil_rgb)
    np.testing.assert_array_equal(native.decode_image(blob, 4), a)


@pytest.mark.parametrize("mode", ["L", "P"])
def test_decode_png_gray_palette(imagepipe, rng, mode):
    a = (rng.uniform(size=(48, 64, 3)) * 255).astype(np.uint8)
    img = Image.fromarray(a).convert(mode, palette=Image.ADAPTIVE)
    b = BytesIO()
    img.save(b, "PNG")
    blob = b.getvalue()
    pil = np.asarray(Image.open(BytesIO(blob)).convert("RGB"))
    np.testing.assert_array_equal(native.decode_image(blob), pil)


def test_decode_jpeg_matches_pil(imagepipe, rng):
    """Same libjpeg build as PIL -> bit-identical decode."""
    a = (rng.uniform(size=(48, 64, 3)) * 255).astype(np.uint8)
    blob = _enc(a, "JPEG", "RGB")
    pil = np.asarray(Image.open(BytesIO(blob)).convert("RGB"))
    np.testing.assert_array_equal(native.decode_image(blob), pil)


def test_decode_batch_f32(imagepipe, rng):
    blobs = [
        _enc((rng.uniform(size=(32, 40, 3)) * 255).astype(np.uint8), "PNG", "RGB")
        for _ in range(7)
    ]
    got = native.decode_batch_f32(blobs, 32, 40, n_threads=3)
    ref = np.stack(
        [np.asarray(Image.open(BytesIO(b)), dtype=np.float32) / 255.0 for b in blobs]
    )
    np.testing.assert_array_equal(got, ref)


def test_decode_batch_reports_failures(imagepipe, rng):
    good = _enc((rng.uniform(size=(32, 40, 3)) * 255).astype(np.uint8), "PNG", "RGB")
    wrong_size = _enc((rng.uniform(size=(8, 8, 3)) * 255).astype(np.uint8), "PNG", "RGB")
    with pytest.raises(ValueError, match="image 1"):
        native.decode_batch_f32([good, wrong_size], 32, 40)
    with pytest.raises(ValueError):
        native.decode_batch_f32([b"not an image"], 32, 40)


def test_decode_size_mismatch(imagepipe, rng):
    blob = _enc((rng.uniform(size=(8, 8, 3)) * 255).astype(np.uint8), "PNG", "RGB")
    lib = native._load_imagepipe()
    out = np.empty((4, 4, 3), np.uint8)
    import ctypes
    rc = lib.ip_decode_u8(
        native._as_u8p(blob), len(blob),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), 4, 4, 3,
    )
    assert rc == -2
