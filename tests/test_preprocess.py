"""Letterbox / stretch preprocessing tests against NumPy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from zero_latency_yolo_tpu.ops import letterbox_batch, letterbox_params, stretch_batch

SIZE = 64


def _np_letterbox(frame, h, w, size):
    """NumPy oracle: aspect-preserving bilinear resize onto a gray canvas."""
    scale = min(size / h, size / w)
    new_h, new_w = round(h * scale), round(w * scale)
    pad_y, pad_x = (size - new_h) / 2.0, (size - new_w) / 2.0
    out = np.full((size, size, 3), 114.0 / 255.0, np.float32)
    for oy in range(size):
        for ox in range(size):
            sy = (oy - pad_y + 0.5) / scale - 0.5
            sx = (ox - pad_x + 0.5) / scale - 0.5
            if not (-0.5 <= sy <= h - 0.5 and -0.5 <= sx <= w - 0.5):
                continue
            y0, x0 = int(np.floor(sy)), int(np.floor(sx))
            fy, fx = sy - y0, sx - x0
            def px(yi, xi):
                return frame[np.clip(yi, 0, h - 1), np.clip(xi, 0, w - 1)].astype(np.float32)
            top = px(y0, x0) * (1 - fx) + px(y0, x0 + 1) * fx
            bot = px(y0 + 1, x0) * (1 - fx) + px(y0 + 1, x0 + 1) * fx
            out[oy, ox] = (top * (1 - fy) + bot * fy) / 255.0
    return out


@pytest.mark.parametrize("h,w", [(48, 64), (64, 32), (30, 50)])
def test_letterbox_matches_numpy_oracle(h, w):
    rng = np.random.default_rng(0)
    hbuf, wbuf = 64, 64
    buf = np.zeros((1, hbuf, wbuf, 3), np.uint8)
    frame = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    buf[0, :h, :w] = frame
    out = np.asarray(letterbox_batch(
        jnp.asarray(buf), jnp.asarray([h]), jnp.asarray([w]), SIZE))[0]
    ref = _np_letterbox(frame, h, w, SIZE)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_letterbox_square_exact_fit_has_no_padding():
    rng = np.random.default_rng(1)
    frame = rng.integers(0, 256, (1, 64, 64, 3), dtype=np.uint8)
    out = np.asarray(letterbox_batch(
        jnp.asarray(frame), jnp.asarray([64]), jnp.asarray([64]), SIZE))[0]
    # identity scale=1 at 64->64: bilinear with aligned centers = exact copy
    np.testing.assert_allclose(out, frame[0] / 255.0, atol=1e-6)


def test_letterbox_pads_with_gray():
    frame = np.full((1, 64, 64, 3), 255, np.uint8)
    out = np.asarray(letterbox_batch(
        jnp.asarray(frame), jnp.asarray([32]), jnp.asarray([64]), SIZE))[0]
    # top rows are padding
    assert np.allclose(out[:int(SIZE / 4) - 1], 114.0 / 255.0, atol=1e-6)
    # center is content
    assert np.allclose(out[SIZE // 2], 1.0, atol=1e-2)


def test_letterbox_params_roundtrip():
    scale, pad_x, pad_y = letterbox_params(jnp.float32(600), jnp.float32(800), 416)
    assert float(scale) == pytest.approx(416 / 800)
    assert float(pad_x) == pytest.approx(0.0)
    assert float(pad_y) == pytest.approx((416 - round(600 * 416 / 800)) / 2)


def test_stretch_matches_reference_semantics():
    rng = np.random.default_rng(2)
    h, w = 48, 32
    buf = np.zeros((1, 64, 64, 3), np.uint8)
    frame = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    buf[0, :h, :w] = frame
    out = np.asarray(stretch_batch(
        jnp.asarray(buf), jnp.asarray([h]), jnp.asarray([w]), SIZE))[0]
    # Oracle: src = floor(dst * src_dim / dst_dim), per reference
    # onnx_engine.cpp:677-697.
    ref = np.zeros((SIZE, SIZE, 3), np.float32)
    for oy in range(SIZE):
        for ox in range(SIZE):
            sy = min(int(oy * h / SIZE), h - 1)
            sx = min(int(ox * w / SIZE), w - 1)
            ref[oy, ox] = frame[sy, sx] / 255.0
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_batch_of_mixed_sizes():
    rng = np.random.default_rng(3)
    buf = rng.integers(0, 256, (3, 64, 64, 3), dtype=np.uint8)
    hs = jnp.asarray([64, 32, 48])
    ws = jnp.asarray([64, 64, 24])
    out = np.asarray(letterbox_batch(jnp.asarray(buf), hs, ws, SIZE))
    assert out.shape == (3, SIZE, SIZE, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_s2d_letterbox_is_channel_shuffle_of_mxu():
    """letterbox_batch_mxu_s2d output must be the exact space-to-depth
    shuffle of letterbox_batch_mxu: z[p,q,a*6+b*3+c] == y[2p+a,2q+b,c]."""
    import numpy as np
    import jax.numpy as jnp
    from zero_latency_yolo_tpu.ops.preprocess import (
        letterbox_batch_mxu, letterbox_batch_mxu_s2d)
    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.integers(0, 256, (2, 72, 96, 3), np.uint8))
    hs = jnp.asarray([60, 72], jnp.int32)
    ws = jnp.asarray([96, 80], jnp.int32)
    size = 64
    y = np.asarray(letterbox_batch_mxu(frames, hs, ws, size))
    z = np.asarray(letterbox_batch_mxu_s2d(frames, hs, ws, size))
    assert z.shape == (2, size // 2, size // 2, 12)
    ref = (y.reshape(2, size // 2, 2, size // 2, 2, 3)
           .transpose(0, 1, 3, 2, 4, 5).reshape(2, size // 2, size // 2, 12))
    np.testing.assert_allclose(z, ref, atol=1e-6)
