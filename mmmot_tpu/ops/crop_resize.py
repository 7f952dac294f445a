"""On-device per-detection crop extraction + bilinear resize.

Replaces the reference's host-side per-detection PIL/cv2 crop+resize
(reference: utils/data_util.py image crop path) with a fused XLA gather: the
full frame stays in HBM once, and all N detection crops are sampled in one
batched bilinear gather (BASELINE.json north star: "per-detection image-crop
extraction ... becomes fused XLA preprocessing").

Shapes: image [H, W, C] + boxes [N, 4] -> crops [N, h, w, C]; leading batch
axes handled by vmap inside :func:`crop_and_resize_batched`.  Boxes are
pixel coordinates (l, t, r, b); sampling matches the usual bilinear
`resize(img[t:b, l:r], (h, w))` semantics with half-pixel centres.  Invalid
slots (mask False) produce zero crops.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _sample_coords(lo, hi, n):
    """Half-pixel-centre sample positions in [lo, hi) for n outputs."""
    i = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    return lo + (hi - lo) * i - 0.5


def crop_and_resize(image: jnp.ndarray, boxes: jnp.ndarray,
                    out_size: Tuple[int, int],
                    mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """image [H, W, C], boxes [N, 4] (l, t, r, b) -> [N, h, w, C]."""
    H, W, C = image.shape
    h, w = out_size
    l, t, r, b = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]

    ys = jax.vmap(lambda lo, hi: _sample_coords(lo, hi, h))(t, b)   # [N, h]
    xs = jax.vmap(lambda lo, hi: _sample_coords(lo, hi, w))(l, r)   # [N, w]

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., :, None]            # [N, h, 1]
    wx = (xs - x0)[..., None, :]            # [N, 1, w]

    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)

    flat = image.reshape(H * W, C)

    def gather(yi, xi):
        # yi [N, h], xi [N, w] -> [N, h, w, C]
        idx = yi[:, :, None] * W + xi[:, None, :]
        return jnp.take(flat, idx.reshape(-1), axis=0).reshape(
            idx.shape + (C,))

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    wy = wy[..., None]
    wx = wx[..., None]
    out = ((1 - wy) * ((1 - wx) * v00 + wx * v01)
           + wy * ((1 - wx) * v10 + wx * v11))
    if mask is not None:
        out = out * mask[:, None, None, None].astype(out.dtype)
    return out


def _interp_matrix(lo, hi, n_out: int, size_in: int, dtype=jnp.float32):
    """Dense 2-tap bilinear interpolation matrix [n_out, size_in].

    Row i holds the two-tap weights for sample position
    ``lo + (hi-lo)*(i+0.5)/n_out - 0.5`` with edge clamping — exactly the
    weights the gather path uses, so both paths agree numerically.
    """
    pos = _sample_coords(lo, hi, n_out)
    pos = jnp.clip(pos, 0.0, size_in - 1.0)
    grid = jnp.arange(size_in, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, None] - grid[None, :]))
    return w.astype(dtype)


def crop_and_resize_mxu(image: jnp.ndarray, boxes: jnp.ndarray,
                        out_size: Tuple[int, int],
                        mask: Optional[jnp.ndarray] = None,
                        compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """MXU formulation of :func:`crop_and_resize`: out = Ry @ img @ Rx^T.

    Element-wise gathers are scalar-slow on TPU (the gather path costs ~1s
    for a 32-frame x 32-det x 112x112 batch); separable bilinear resize is a
    pair of dense matmuls that the MXU eats: per detection,
    ``tmp = img @ Rx^T`` ([H, W, C] x [w, W]) then ``out = Ry @ tmp``.
    Interpolation matrices are built from the same 2-tap weights as the
    gather path, so results agree to compute-dtype precision.
    """
    H, W, C = image.shape
    h, w = out_size
    l, t, r, b = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    ry = jax.vmap(lambda lo, hi: _interp_matrix(lo, hi, h, H,
                                                compute_dtype))(t, b)
    rx = jax.vmap(lambda lo, hi: _interp_matrix(lo, hi, w, W,
                                                compute_dtype))(l, r)
    img = image.astype(compute_dtype)
    # x-resize first (W is the large axis): [N, H, w, C]
    tmp = jnp.einsum("HWc,nwW->nHwc", img, rx,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("nhH,nHwc->nhwc", ry.astype(jnp.float32), tmp,
                     preferred_element_type=jnp.float32)
    if mask is not None:
        out = out * mask[:, None, None, None].astype(out.dtype)
    return out


def _window_starts(boxes: jnp.ndarray, W: int, win: int):
    """Column start of a ``win``-wide band centred on each box (clamped)."""
    cx = 0.5 * (boxes[:, 0] + boxes[:, 2])
    return jnp.clip(jnp.round(cx - win / 2.0), 0.0, float(W - win))


def _band_resize(bands: jnp.ndarray, boxes: jnp.ndarray, ws: jnp.ndarray,
                 out_size: Tuple[int, int],
                 mask: Optional[jnp.ndarray],
                 compute_dtype) -> jnp.ndarray:
    """Separable MXU bilinear resize of per-detection column bands.

    bands [n, H, win, C] (already sliced starting at column ``ws[n]``),
    boxes [n, 4] in full-frame pixels -> crops [n, h, w, C].  Shared core
    of the padded-slot windowed crop and the compact-first gathered crop —
    both must stay numerically identical.
    """
    n, H, win, C = bands.shape
    h, w = out_size
    l, t, r, b = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    ry = jax.vmap(lambda lo, hi: _interp_matrix(lo, hi, h, H,
                                                compute_dtype))(t, b)
    rx = jax.vmap(lambda lo, hi, s: _interp_matrix(lo - s, hi - s, w, win,
                                                   compute_dtype))(l, r, ws)
    tmp = jnp.einsum("nHWc,nwW->nHwc", bands.astype(compute_dtype), rx,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("nhH,nHwc->nhwc", ry.astype(jnp.float32), tmp,
                     preferred_element_type=jnp.float32)
    if mask is not None:
        out = out * mask[:, None, None, None].astype(out.dtype)
    return out


def crop_and_resize_mxu_windowed(image: jnp.ndarray, boxes: jnp.ndarray,
                                 out_size: Tuple[int, int],
                                 mask: Optional[jnp.ndarray] = None,
                                 window: int = 512,
                                 compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Windowed MXU crop: slice a fixed-width window around each box first.

    The dense x-resize matmul costs H*w*W FLOPs per detection; KITTI frames
    are ~1248 px wide but boxes are only up to a few hundred.  Slicing a
    static ``window`` of columns around each box (contiguous
    ``dynamic_slice`` — fast on TPU, unlike arbitrary gathers) before the
    separable resize cuts the dominant term by W/window.  Boxes wider than
    ``window`` fall back to resizing the window's contents (clamped), so
    pick ``window`` >= the widest expected box.
    """
    H, W, C = image.shape
    win = min(window, W)
    ws = _window_starts(boxes, W, win)
    ws_i = ws.astype(jnp.int32)
    img = image.astype(compute_dtype)
    bands = jax.vmap(
        lambda s: jax.lax.dynamic_slice(img, (0, s, 0), (H, win, C)))(ws_i)
    return _band_resize(bands, boxes, ws, out_size, mask, compute_dtype)


def crop_and_resize_gathered(images: jnp.ndarray, frame_idx: jnp.ndarray,
                             boxes: jnp.ndarray, out_size: Tuple[int, int],
                             mask: Optional[jnp.ndarray] = None,
                             window: int = 512,
                             compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Crop a *compacted* detection list straight from a frame stack.

    images [T, H, W, C], frame_idx [n] int32 (source frame per detection),
    boxes [n, 4] -> crops [n, h, w, C].  Designed for the compact-first
    streaming pipeline: only valid detections ever touch the resize matmuls
    or the conv stack.  Per detection we ``dynamic_slice`` a static
    ``window``-column band around the box from its source frame (contiguous
    slices — fast on TPU, unlike arbitrary gathers) and run the separable
    MXU bilinear resize on the band.  Boxes wider than ``window`` resize the
    clamped band contents.
    """
    T, H, W, C = images.shape
    win = min(window, W)
    ws = _window_starts(boxes, W, win)
    ws_i = ws.astype(jnp.int32)

    def slice_one(ti, si):
        return jax.lax.dynamic_slice(
            images, (ti, jnp.int32(0), si, jnp.int32(0)), (1, H, win, C))[0]

    bands = jax.vmap(slice_one)(frame_idx.astype(jnp.int32), ws_i)
    return _band_resize(bands, boxes, ws, out_size, mask, compute_dtype)


def crop_and_resize_batched(images: jnp.ndarray, boxes: jnp.ndarray,
                            out_size: Tuple[int, int],
                            mask: Optional[jnp.ndarray] = None,
                            method: str = "mxu") -> jnp.ndarray:
    """images [..., H, W, C], boxes [..., N, 4] -> [..., N, h, w, C].

    ``method='mxu'`` (default) uses the matmul formulation — the fast path
    on TPU; ``'mxu_win'`` additionally slices a window around each box
    before resizing (fewer FLOPs; window=512); ``'gather'`` uses the
    element-wise gather path (exact reference, fast on CPU).
    """
    lead = boxes.shape[:-2]
    H, W, C = images.shape[-3:]
    N = boxes.shape[-2]
    img_flat = images.reshape((-1, H, W, C))
    box_flat = boxes.reshape((-1, N, 4))
    m_flat = (mask.reshape((-1, N)) if mask is not None
              else jnp.ones((box_flat.shape[0], N), bool))
    base = {"gather": crop_and_resize, "mxu": crop_and_resize_mxu,
            "mxu_win": crop_and_resize_mxu_windowed}[method]
    fn = jax.vmap(partial(base, out_size=out_size))
    out = fn(img_flat, box_flat, mask=m_flat)
    return out.reshape(lead + (N,) + out.shape[-3:])


def normalize_crops(crops: jnp.ndarray,
                    mean=(0.485, 0.456, 0.406),
                    std=(0.229, 0.224, 0.225),
                    scale: float = 1.0 / 255.0) -> jnp.ndarray:
    """uint8/float pixel crops -> ImageNet-normalised floats (reference
    normalisation constants, SURVEY.md §3.4)."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (crops.astype(jnp.float32) * scale - mean) / std
