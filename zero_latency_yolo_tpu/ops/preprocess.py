"""On-device frame preprocessing: letterbox resize + normalize.

Replaces the reference's host-side per-pixel loop
(src/inference/onnx_engine.cpp:649-700 — nearest-neighbor *stretch*, /255,
NCHW) with a device-side batched resample producing NHWC float inputs.

Design for XLA/TPU:
- Static shapes: frames arrive padded into a fixed (Hbuf, Wbuf) host bucket;
  the *actual* per-frame (h, w) are runtime scalars, so one compiled program
  serves every client resolution within a bucket (no recompiles, the batching
  scheduler keys programs by (batch, bucket)).
- Letterbox (default, per BASELINE.json): aspect-preserving bilinear resize
  onto a 114-gray canvas, the ultralytics convention. `stretch_batch` keeps
  the reference's literal nearest-neighbor stretch semantics as an opt-in.
- The gather-based resample lowers to vectorized XLA gathers that fuse with
  the /255 normalize; everything stays on device.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

FILL = 114.0 / 255.0  # ultralytics letterbox gray


def letterbox_params(h, w, size: int):
    """Scale and pad offsets for letterboxing (h, w) into (size, size).

    Returns (scale, pad_x, pad_y) as f32 scalars; works on traced values.
    """
    h = h.astype(jnp.float32) if hasattr(h, "astype") else jnp.float32(h)
    w = w.astype(jnp.float32) if hasattr(w, "astype") else jnp.float32(w)
    scale = jnp.minimum(size / h, size / w)
    new_h = jnp.round(h * scale)
    new_w = jnp.round(w * scale)
    pad_y = (size - new_h) / 2.0
    pad_x = (size - new_w) / 2.0
    return scale, pad_x, pad_y


def _bilinear_sample(frame: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray,
                     h, w, fill: float) -> jnp.ndarray:
    """Bilinear sample frame (Hbuf, Wbuf, 3) at float coords; out-of-range -> fill."""
    hbuf, wbuf = frame.shape[0], frame.shape[1]
    inside = (sy >= -0.5) & (sy <= h - 0.5) & (sx >= -0.5) & (sx <= w - 0.5)
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy = (sy - y0)[..., None]
    fx = (sx - x0)[..., None]

    def clip_gather(yi, xi):
        yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat = frame.reshape(hbuf * wbuf, 3)
        return flat[yi * wbuf + xi].astype(jnp.float32)

    v00 = clip_gather(y0, x0)
    v01 = clip_gather(y0, x0 + 1)
    v10 = clip_gather(y0 + 1, x0)
    v11 = clip_gather(y0 + 1, x0 + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    out = (top * (1 - fy) + bot * fy) / 255.0
    return jnp.where(inside[..., None], out, fill)


def _letterbox_one(frame: jnp.ndarray, h, w, size: int) -> jnp.ndarray:
    scale, pad_x, pad_y = letterbox_params(h, w, size)
    oy = jnp.arange(size, dtype=jnp.float32)
    ox = jnp.arange(size, dtype=jnp.float32)
    sy = (oy[:, None] - pad_y + 0.5) / scale - 0.5
    sx = (ox[None, :] - pad_x + 0.5) / scale - 0.5
    sy = jnp.broadcast_to(sy, (size, size))
    sx = jnp.broadcast_to(sx, (size, size))
    hf = h.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    return _bilinear_sample(frame, sy, sx, hf, wf, FILL)


@partial(jax.jit, static_argnums=(3,))
def letterbox_batch(frames: jnp.ndarray, heights: jnp.ndarray,
                    widths: jnp.ndarray, size: int) -> jnp.ndarray:
    """Letterbox a padded uint8 batch (B, Hbuf, Wbuf, 3) -> (B, size, size, 3) f32.

    heights/widths: (B,) int32 actual frame dims within the padded buffer.
    """
    return jax.vmap(lambda f, h, w: _letterbox_one(f, h, w, size))(
        frames, heights, widths)


def _interp_matrix(src_coords: jnp.ndarray, src_size: int, valid_len) -> jnp.ndarray:
    """(out, src_size) bilinear interpolation matrix for runtime coords.

    Row o has weight (1-f) at clip(floor(c),0,valid-1) and f at
    clip(floor(c)+1,0,valid-1); when both clip to the same index the weights
    sum to 1 (edge replication). Rows whose source coordinate falls outside
    [-0.5, valid-0.5] are zeroed (letterbox padding, filled afterwards).
    """
    c0 = jnp.floor(src_coords)
    f = (src_coords - c0)[:, None]
    valid_f = valid_len.astype(jnp.float32)
    i0 = jnp.clip(c0, 0, valid_f - 1)[:, None]
    i1 = jnp.clip(c0 + 1, 0, valid_f - 1)[:, None]
    idx = jax.lax.broadcasted_iota(jnp.float32, (src_coords.shape[0], src_size), 1)
    mat = (idx == i0) * (1.0 - f) + (idx == i1) * f
    inside = ((src_coords >= -0.5) & (src_coords <= valid_f - 0.5))[:, None]
    return jnp.where(inside, mat, 0.0)


def _letterbox_one_mxu(frame: jnp.ndarray, h, w, size: int,
                       dtype=jnp.float32) -> jnp.ndarray:
    """Letterbox via two interpolation matmuls — resize runs on the MXU.

    out[o, p, c] = sum_{i, j} Ry[o, i] * frame[i, j, c] * Rx[p, j]
    Ry/Rx are built from the runtime (h, w) scalars, so one compiled program
    still serves every resolution in the bucket; the systolic array does the
    resampling instead of vector-lane gathers.
    """
    hbuf, wbuf = frame.shape[0], frame.shape[1]
    scale, pad_x, pad_y = letterbox_params(h, w, size)
    o = jnp.arange(size, dtype=jnp.float32)
    src_y = (o - pad_y + 0.5) / scale - 0.5
    src_x = (o - pad_x + 0.5) / scale - 0.5
    ry = _interp_matrix(src_y, hbuf, h).astype(dtype)        # (S, Hbuf)
    rx = _interp_matrix(src_x, wbuf, w).astype(dtype)        # (S, Wbuf)
    f = frame.astype(dtype)
    tmp = jnp.einsum("oi,ijc->ojc", ry, f,
                     preferred_element_type=jnp.float32)      # (S, Wbuf, 3)
    out = jnp.einsum("pj,ojc->opc", rx, tmp.astype(dtype),
                     preferred_element_type=jnp.float32)      # (S, S, 3)
    out = out / 255.0
    inside = ((src_y >= -0.5) & (src_y <= h.astype(jnp.float32) - 0.5))[:, None] & \
             ((src_x >= -0.5) & (src_x <= w.astype(jnp.float32) - 0.5))[None, :]
    return jnp.where(inside[..., None], out, FILL).astype(jnp.float32)


@partial(jax.jit, static_argnums=(3, 4))
def letterbox_batch_mxu(frames: jnp.ndarray, heights: jnp.ndarray,
                        widths: jnp.ndarray, size: int,
                        dtype=jnp.float32) -> jnp.ndarray:
    """MXU-matmul letterbox (numerically identical to letterbox_batch at
    f32; pass dtype=bfloat16 to halve the interpolation's HBM traffic —
    pixel error stays below one uint8 quantization step)."""
    return jax.vmap(lambda f, h, w: _letterbox_one_mxu(f, h, w, size, dtype))(
        frames, heights, widths)


def _letterbox_one_mxu_s2d(frame: jnp.ndarray, h, w, size: int,
                           dtype=jnp.float32) -> jnp.ndarray:
    """MXU letterbox emitting the space-to-depth layout directly:
    (S/2, S/2, 12) with channel a*6+b*3+c = letterboxed[2p+a, 2q+b, c].

    The 416x416x3 intermediate never materializes — the row-interp matrix is
    split by output-row parity into two half-height matmuls (identical dot
    products, same FLOPs), each column-interp matmul writes its (a, b)
    channel block. Feeds models.yolov8 stem="s2d"."""
    hbuf, wbuf = frame.shape[0], frame.shape[1]
    scale, pad_x, pad_y = letterbox_params(h, w, size)
    o = jnp.arange(size, dtype=jnp.float32)
    src_y = (o - pad_y + 0.5) / scale - 0.5
    src_x = (o - pad_x + 0.5) / scale - 0.5
    ry = _interp_matrix(src_y, hbuf, h).astype(dtype)        # (S, Hbuf)
    rx = _interp_matrix(src_x, wbuf, w).astype(dtype)        # (S, Wbuf)
    hf = h.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    iy = (src_y >= -0.5) & (src_y <= hf - 0.5)
    ix = (src_x >= -0.5) & (src_x <= wf - 0.5)
    f = frame.astype(dtype)
    blocks = []
    for a in (0, 1):
        tmp = jnp.einsum("oi,ijc->ojc", ry[a::2], f,
                         preferred_element_type=jnp.float32)  # (S/2, Wbuf, 3)
        for b in (0, 1):
            out = jnp.einsum("pj,ojc->opc", rx[b::2], tmp.astype(dtype),
                             preferred_element_type=jnp.float32) / 255.0
            inside = iy[a::2][:, None] & ix[b::2][None, :]
            blocks.append(jnp.where(inside[..., None], out, FILL))
    return jnp.concatenate(blocks, axis=-1).astype(jnp.float32)


@partial(jax.jit, static_argnums=(3, 4))
def letterbox_batch_mxu_s2d(frames: jnp.ndarray, heights: jnp.ndarray,
                            widths: jnp.ndarray, size: int,
                            dtype=jnp.float32) -> jnp.ndarray:
    """Space-to-depth MXU letterbox: (B, size/2, size/2, 12); exact
    channel-shuffle of letterbox_batch_mxu output."""
    assert size % 2 == 0, "s2d letterbox needs an even model size"
    return jax.vmap(lambda f, h, w: _letterbox_one_mxu_s2d(f, h, w, size,
                                                           dtype))(
        frames, heights, widths)


def _letterbox_one_rowcol(frame: jnp.ndarray, h, w, size: int,
                          dtype=jnp.float32) -> jnp.ndarray:
    """Letterbox via separable row/column gathers + lerp.

    Bilinear taps exactly two source rows per output row, so the resample is
    S row-gathers and S column-gathers (contiguous slices — TPU-friendly)
    instead of S^2 point gathers or a dense interp matmul. Works with
    runtime (h, w) like the other forms.
    """
    scale, pad_x, pad_y = letterbox_params(h, w, size)
    hf = h.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    o = jnp.arange(size, dtype=jnp.float32)
    sy = (o - pad_y + 0.5) / scale - 0.5
    sx = (o - pad_x + 0.5) / scale - 0.5

    y0f = jnp.floor(sy)
    fy = (sy - y0f).astype(dtype)
    y0 = jnp.clip(y0f, 0, hf - 1).astype(jnp.int32)
    y1 = jnp.clip(y0f + 1, 0, hf - 1).astype(jnp.int32)
    rows = (frame[y0].astype(dtype) * (1 - fy)[:, None, None] +
            frame[y1].astype(dtype) * fy[:, None, None])   # (S, Wbuf, 3)

    x0f = jnp.floor(sx)
    fx = (sx - x0f).astype(dtype)
    x0 = jnp.clip(x0f, 0, wf - 1).astype(jnp.int32)
    x1 = jnp.clip(x0f + 1, 0, wf - 1).astype(jnp.int32)
    out = (rows[:, x0] * (1 - fx)[None, :, None] +
           rows[:, x1] * fx[None, :, None])                # (S, S, 3)
    out = out.astype(jnp.float32) / 255.0

    inside = ((sy >= -0.5) & (sy <= hf - 0.5))[:, None] & \
             ((sx >= -0.5) & (sx <= wf - 0.5))[None, :]
    return jnp.where(inside[..., None], out, FILL)


@partial(jax.jit, static_argnums=(3, 4))
def letterbox_batch_rowcol(frames: jnp.ndarray, heights: jnp.ndarray,
                           widths: jnp.ndarray, size: int,
                           dtype=jnp.float32) -> jnp.ndarray:
    """Separable row/column-gather letterbox (numerically identical to
    letterbox_batch at f32)."""
    return jax.vmap(lambda f, h, w: _letterbox_one_rowcol(f, h, w, size, dtype))(
        frames, heights, widths)


def _stretch_one(frame: jnp.ndarray, h, w, size: int) -> jnp.ndarray:
    # Reference semantics (onnx_engine.cpp:677-697): nearest-neighbor stretch,
    # src index = floor(dst * src/dst_size).
    hbuf, wbuf = frame.shape[0], frame.shape[1]
    o = jnp.arange(size, dtype=jnp.float32)
    sy = jnp.clip((o * h.astype(jnp.float32) / size).astype(jnp.int32), 0, h - 1)
    sx = jnp.clip((o * w.astype(jnp.float32) / size).astype(jnp.int32), 0, w - 1)
    flat = frame.reshape(hbuf * wbuf, 3)
    idx = sy[:, None] * wbuf + sx[None, :]
    return flat[idx].astype(jnp.float32) / 255.0


@partial(jax.jit, static_argnums=(3,))
def stretch_batch(frames: jnp.ndarray, heights: jnp.ndarray,
                  widths: jnp.ndarray, size: int) -> jnp.ndarray:
    """Reference-compatible nearest-neighbor stretch resize (no letterbox)."""
    return jax.vmap(lambda f, h, w: _stretch_one(f, h, w, size))(
        frames, heights, widths)
