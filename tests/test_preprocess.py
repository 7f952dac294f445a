"""On-device preprocessing: crop-resize + frustum sampling vs host refs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmmot_tpu.ops.crop_resize import (crop_and_resize,
                                       crop_and_resize_batched,
                                       normalize_crops)
from mmmot_tpu.ops.frustum import frustum_sample, frustum_sample_batched

H, W = 60, 80


def np_crop_resize(img, box, out):
    l, t, r, b = box
    h, w = out
    ys = t + (b - t) * (np.arange(h) + 0.5) / h - 0.5
    xs = l + (r - l) * (np.arange(w) + 0.5) / w - 0.5
    y0 = np.floor(ys); x0 = np.floor(xs)
    wy = (ys - y0)[:, None, None]; wx = (xs - x0)[None, :, None]
    y0i = np.clip(y0.astype(int), 0, H - 1); y1i = np.clip(y0i + 1, 0, H - 1)
    x0i = np.clip(x0.astype(int), 0, W - 1); x1i = np.clip(x0i + 1, 0, W - 1)
    g = lambda yi, xi: img[yi][:, xi]
    return ((1 - wy) * ((1 - wx) * g(y0i, x0i) + wx * g(y0i, x1i))
            + wy * ((1 - wx) * g(y1i, x0i) + wx * g(y1i, x1i)))


@pytest.fixture(scope="module")
def img(rng):
    return np.random.default_rng(3).uniform(
        0, 255, (H, W, 3)).astype(np.float32)


def test_crop_matches_numpy(img):
    boxes = np.array([[10.5, 5.2, 42.7, 30.9], [0, 0, W, H],
                      [70, 50, 79, 59]], np.float32)
    out = np.asarray(jax.jit(
        lambda i, b: crop_and_resize(i, b, (16, 16)))(
        jnp.asarray(img), jnp.asarray(boxes)))
    for k in range(3):
        ref = np_crop_resize(img, boxes[k], (16, 16))
        assert np.abs(out[k] - ref).max() < 1e-3


def test_crop_identity(img):
    box = jnp.asarray([[0, 0, W, H]], jnp.float32)
    out = np.asarray(jax.jit(
        lambda i, b: crop_and_resize(i, b, (H, W)))(jnp.asarray(img), box))
    assert np.abs(out[0] - img).max() == 0.0


def test_crop_masked_zero(img):
    boxes = jnp.asarray([[5, 5, 20, 20], [5, 5, 20, 20]], jnp.float32)
    mask = jnp.asarray([True, False])
    out = np.asarray(jax.jit(
        lambda i, b, m: crop_and_resize(i, b, (8, 8), m))(
        jnp.asarray(img), boxes, mask))
    assert (out[1] == 0).all() and (out[0] != 0).any()


def test_crop_batched_shapes(img):
    imgs = jnp.stack([jnp.asarray(img)] * 4).reshape(2, 2, H, W, 3)
    boxes = jnp.broadcast_to(
        jnp.asarray([10, 10, 30, 30], jnp.float32), (2, 2, 5, 4))
    out = jax.jit(lambda i, b: crop_and_resize_batched(i, b, (8, 8)))(
        imgs, boxes)
    assert out.shape == (2, 2, 5, 8, 8, 3)


def test_mxu_crop_matches_gather(img):
    boxes = np.array([[10.5, 5.2, 42.7, 30.9], [2, 2, 70, 55]], np.float32)
    g = np.asarray(jax.jit(lambda i, b: crop_and_resize_batched(
        i[None], b[None], (16, 16), method="gather"))(
        jnp.asarray(img), jnp.asarray(boxes)))
    for method in ("mxu", "mxu_win"):
        m = np.asarray(jax.jit(lambda i, b, mm=method: crop_and_resize_batched(
            i[None], b[None], (16, 16), method=mm))(
            jnp.asarray(img), jnp.asarray(boxes)))
        # bf16 compute: ~0.5% of range tolerance
        assert np.abs(m - g).max() < 2.0, method


def test_normalize_crops():
    crops = jnp.full((2, 4, 4, 3), 255.0)
    out = np.asarray(normalize_crops(crops))
    expect = (1.0 - np.array([0.485, 0.456, 0.406])) / np.array(
        [0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0, 0, 0], expect, rtol=1e-5)


def _cloud(rng, M=400):
    pts = np.zeros((M, 4), np.float32)
    pts[:, 0] = rng.uniform(-20, 20, M)
    pts[:, 1] = rng.uniform(-5, 5, M)
    pts[:, 2] = rng.uniform(2, 40, M)
    pts[:, 3] = rng.uniform(0, 1, M)
    proj = np.array([[100.0, 0, 40, 0], [0, 100.0, 30, 0], [0, 0, 1, 0]],
                    np.float32)
    u = 100 * pts[:, 0] / pts[:, 2] + 40
    v = 100 * pts[:, 1] / pts[:, 2] + 30
    return pts, proj, u, v


def test_frustum_membership(rng):
    pts, proj, u, v = _cloud(np.random.default_rng(5))
    box = np.array([[20, 10, 60, 50], [0, 0, 1, 1]], np.float32)
    samp, mask = jax.jit(lambda p, b, pr: frustum_sample(p, b, pr, 64))(
        jnp.asarray(pts), jnp.asarray(box), jnp.asarray(proj))
    samp, mask = np.asarray(samp), np.asarray(mask)
    inside = (u >= 20) & (u <= 60) & (v >= 10) & (v <= 50) & (pts[:, 2] > 0.1)
    assert mask[0].sum() == min(inside.sum(), 64)
    assert mask[1].sum() == 0
    # centering: sampled xyz centroid ~0; reflectance preserved in order
    m0 = mask[0].astype(bool)
    assert np.abs(samp[0][m0, :3].mean(0)).max() < 1e-4
    first = np.flatnonzero(inside)[0]
    assert abs(samp[0][0, 3] - pts[first, 3]) < 1e-6


def test_frustum_batched(rng):
    pts, proj, _, _ = _cloud(np.random.default_rng(6))
    clouds = jnp.stack([jnp.asarray(pts)] * 2)
    boxes = jnp.broadcast_to(
        jnp.asarray([20, 10, 60, 50], jnp.float32), (2, 3, 4))
    samp, mask = jax.jit(
        lambda p, b, pr: frustum_sample_batched(p, b, pr, 32))(
        clouds, boxes, jnp.asarray(proj))
    assert samp.shape == (2, 3, 32, 4)
    assert mask.shape == (2, 3, 32)


def test_gathered_crop_matches_mxu(img):
    """Compact-first gathered crop == per-slot MXU crop on valid slots."""
    from mmmot_tpu.ops.crop_resize import crop_and_resize_gathered

    T = 3
    imgs = np.stack([img, img * 0.5, img[::-1].copy()])
    boxes = np.array([[10.5, 5.2, 42.7, 30.9], [2, 2, 70, 55],
                      [30, 20, 60, 50]], np.float32)
    frame_idx = np.array([0, 2, 1], np.int32)
    g = np.asarray(jax.jit(lambda i, f, b: crop_and_resize_gathered(
        i, f, b, (16, 16), window=W))(
        jnp.asarray(imgs), jnp.asarray(frame_idx), jnp.asarray(boxes)))
    for k in range(3):
        ref = np.asarray(jax.jit(lambda i, b: crop_and_resize_batched(
            i[None], b[None], (16, 16), method="mxu"))(
            jnp.asarray(imgs[frame_idx[k]]), jnp.asarray(boxes[k:k + 1])))
        assert np.abs(g[k] - ref[0, 0]).max() < 2.0, k


def test_gathered_crop_window_narrower_than_frame(img):
    """A window narrower than the frame still crops boxes inside it."""
    from mmmot_tpu.ops.crop_resize import crop_and_resize_gathered

    imgs = img[None]
    boxes = np.array([[30, 10, 55, 40]], np.float32)   # 25px wide box
    full = np.asarray(jax.jit(lambda i, f, b: crop_and_resize_gathered(
        i, f, b, (8, 8), window=W))(
        jnp.asarray(imgs), jnp.zeros(1, jnp.int32), jnp.asarray(boxes)))
    win = np.asarray(jax.jit(lambda i, f, b: crop_and_resize_gathered(
        i, f, b, (8, 8), window=40))(
        jnp.asarray(imgs), jnp.zeros(1, jnp.int32), jnp.asarray(boxes)))
    assert np.abs(full - win).max() < 2.0


def test_box3d_sample_matches_host_oracle():
    """On-device points-in-3D-box sampling == host points_in_box3d."""
    from mmmot_tpu.data.box3d import points_in_box3d
    from mmmot_tpu.ops.frustum import box3d_sample

    rng = np.random.default_rng(9)
    M, P = 500, 32
    pts = np.zeros((M, 4), np.float32)
    pts[:, 0] = rng.uniform(-10, 10, M)     # rect x
    pts[:, 1] = rng.uniform(-3, 2, M)       # rect y (down)
    pts[:, 2] = rng.uniform(0, 40, M)       # rect z (forward)
    pts[:, 3] = rng.uniform(0, 1, M)
    boxes = np.array([
        [1.5, 1.7, 4.0, 2.0, 1.6, 15.0, 0.3],   # h w l x y z ry
        [1.8, 0.6, 0.9, -4.0, 1.2, 8.0, -1.2],
        [1.5, 1.7, 4.0, 100.0, 0.0, 100.0, 0.0],  # empty box
    ], np.float32)

    sampled, mask = jax.jit(lambda p, b: box3d_sample(p, b, P))(
        jnp.asarray(pts), jnp.asarray(boxes))
    sampled, mask = np.asarray(sampled), np.asarray(mask)
    for k in range(len(boxes)):
        inside = np.asarray(points_in_box3d(pts[:, :3], boxes[k]))
        assert mask[k].sum() == min(inside.sum(), P), k
        if inside.sum():
            # First sampled point is the first in-box point (scan order),
            # centred on the selection centroid.
            sel = pts[inside][:P]
            centroid = sel[:, :3].mean(0)
            np.testing.assert_allclose(
                sampled[k, 0, :3], pts[inside][0, :3] - centroid,
                atol=1e-4)
            assert abs(sampled[k, 0, 3] - pts[inside][0, 3]) < 1e-6


def test_box3d_sample_velo_transform():
    """velo_to_rect is applied before the membership test."""
    from mmmot_tpu.ops.frustum import box3d_sample

    # velo (x fwd, y left, z up) -> rect (x right, y down, z fwd).
    T = np.array([[0.0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]], np.float32)
    pts_v = np.array([[15.0, -2.0, -1.0, 0.5]], np.float32)  # rect (2,1,15)
    box = np.array([[1.5, 1.7, 4.0, 2.0, 1.6, 15.0, 0.0]], np.float32)
    _, mask = jax.jit(lambda p, b, t: box3d_sample(p, b, 4,
                                                   velo_to_rect=t))(
        jnp.asarray(pts_v), jnp.asarray(box), jnp.asarray(T))
    assert bool(np.asarray(mask)[0, 0])
