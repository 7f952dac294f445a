"""Coverage for 3D box utilities and training meters."""

import numpy as np
import pytest

from mmmot_tpu.data.box3d import box3d_corners, iou3d, points_in_box3d
from mmmot_tpu.utils.meters import AverageMeter, ScalarWriter


def box(h, w, l, x, y, z, ry):
    return np.array([h, w, l, x, y, z, ry], float)


def test_corners_axis_aligned():
    b = box(2.0, 1.0, 4.0, 10.0, 1.0, 20.0, 0.0)
    c = np.asarray(box3d_corners(b))
    assert c.shape == (8, 3)
    np.testing.assert_allclose(c[:, 0].min(), 8.0)    # x: 10 +- l/2
    np.testing.assert_allclose(c[:, 0].max(), 12.0)
    np.testing.assert_allclose(c[:, 2].min(), 19.5)   # z: 20 +- w/2
    np.testing.assert_allclose(c[:, 2].max(), 20.5)
    np.testing.assert_allclose(c[:, 1].min(), -1.0)   # y: bottom 1, top -1
    np.testing.assert_allclose(c[:, 1].max(), 1.0)


def test_points_in_box_rotation():
    b = box(2.0, 2.0, 4.0, 0.0, 0.0, 0.0, np.pi / 2)  # yaw 90deg: l<->w
    pts = np.array([[0.5, -1.0, 1.5],   # inside after rotation (z within l/2)
                    [1.5, -1.0, 0.5],   # outside (x beyond w/2 after rot)
                    [0.0, -3.0, 0.0]])  # above the box
    m = np.asarray(points_in_box3d(pts, b))
    assert m.tolist() == [True, False, False]


def test_iou3d_identical_and_disjoint():
    a = box(1.5, 1.6, 3.9, 0, 1, 10, 0.3)
    i3, ibev = iou3d(a, a)
    assert i3 == pytest.approx(1.0, abs=1e-6)
    assert ibev == pytest.approx(1.0, abs=1e-6)
    b = box(1.5, 1.6, 3.9, 50, 1, 10, 0.3)
    i3, ibev = iou3d(a, b)
    assert i3 == 0.0 and ibev == 0.0


def test_iou3d_half_overlap():
    a = box(2.0, 2.0, 2.0, 0, 0, 0, 0.0)
    b = box(2.0, 2.0, 2.0, 1.0, 0, 0, 0.0)   # shifted half a length in x
    i3, ibev = iou3d(a, b)
    # overlap volume 1*2*2=4, union 16-4=12 -> 1/3
    assert ibev == pytest.approx(1 / 3, abs=1e-6)
    assert i3 == pytest.approx(1 / 3, abs=1e-6)


def test_iou3d_height_offset():
    a = box(2.0, 2.0, 2.0, 0, 0, 0, 0.0)
    b = box(2.0, 2.0, 2.0, 0, -1.0, 0, 0.0)  # shifted up by 1 (y up-neg)
    i3, ibev = iou3d(a, b)
    assert ibev == pytest.approx(1.0, abs=1e-6)
    assert i3 == pytest.approx(1 / 3, abs=1e-6)


def test_average_meter_window():
    m = AverageMeter(window=3)
    for v in (1.0, 2.0, 3.0, 4.0):
        m.update(v)
    assert m.avg == pytest.approx(3.0)    # last 3: 2,3,4
    m2 = AverageMeter()
    for v in (1.0, 2.0, 3.0, 4.0):
        m2.update(v)
    assert m2.avg == pytest.approx(2.5)


def test_scalar_writer(tmp_path):
    import json

    p = str(tmp_path / "scalars.jsonl")
    w = ScalarWriter(p)
    w.write(1, {"loss": 0.5, "lr": 1e-3})
    w.write(2, {"loss": 0.4})
    w.close()
    rows = [json.loads(l) for l in open(p)]
    assert len(rows) == 3
    assert rows[0]["tag"] == "loss" and rows[0]["step"] == 1


def test_frustum_sorted_subset(rng):
    """Sorted fast path returns valid in-box points only."""
    import jax
    import jax.numpy as jnp

    from mmmot_tpu.ops.frustum import frustum_sample_sorted, project_points

    r = np.random.default_rng(9)
    M, P = 1000, 32
    pts = np.zeros((M, 4), np.float32)
    pts[:, 0] = r.uniform(-20, 20, M)
    pts[:, 1] = r.uniform(-5, 5, M)
    pts[:, 2] = r.uniform(2, 40, M)
    pts[:, 3] = np.arange(M) / M          # unique tag per point
    proj = np.array([[100.0, 0, 40, 0], [0, 100.0, 30, 0], [0, 0, 1, 0]],
                    np.float32)
    boxes = np.array([[20, 10, 60, 50], [0, 0, 1, 1]], np.float32)
    samp, mask = jax.jit(lambda p, b: frustum_sample_sorted(
        p, b, jnp.asarray(proj), P, center=False))(
        jnp.asarray(pts), jnp.asarray(boxes))
    samp, mask = np.asarray(samp), np.asarray(mask)
    u = 100 * pts[:, 0] / pts[:, 2] + 40
    v = 100 * pts[:, 1] / pts[:, 2] + 30
    inside = ((u >= 20) & (u <= 60) & (v >= 10) & (v <= 50)
              & (pts[:, 2] > 0.1))
    in_tags = set(np.round(pts[inside, 3], 6).tolist())
    got_tags = set(np.round(samp[0][mask[0].astype(bool), 3], 6).tolist())
    assert got_tags <= in_tags            # only genuine in-box points
    assert mask[0].sum() == min(inside.sum(), P)
    assert mask[1].sum() == 0
