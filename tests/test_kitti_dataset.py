"""Real-data path: calibration math + dataset packer on a fabricated tree."""

import os

import numpy as np
import pytest

from mmmot_tpu.config import DataConfig
from mmmot_tpu.data.calib import Calibration
from mmmot_tpu.data.kitti_dataset import (IMG_H, IMG_W,
                                          KittiTrackingDataset)
from mmmot_tpu.data.kitti_io import KittiObject, write_kitti_result

P2 = np.array([[721.5, 0.0, 609.5, 44.9],
               [0.0, 721.5, 172.8, 0.2],
               [0.0, 0.0, 1.0, 0.003]])
R0 = np.eye(3)
V2C = np.array([[0.0, -1.0, 0.0, 0.0],
                [0.0, 0.0, -1.0, -0.08],
                [1.0, 0.0, 0.0, -0.27]])


def _write_calib(path):
    with open(path, "w") as f:
        f.write("P0: " + " ".join(["0"] * 12) + "\n")
        f.write("P2: " + " ".join(str(x) for x in P2.ravel()) + "\n")
        f.write("R_rect " + " ".join(str(x) for x in R0.ravel()) + "\n")
        f.write("Tr_velo_cam " + " ".join(str(x) for x in V2C.ravel()) + "\n")


def test_calibration_math(tmp_path):
    p = str(tmp_path / "calib.txt")
    _write_calib(p)
    calib = Calibration.from_file(p)
    # A velodyne point straight ahead (x forward) maps near the image centre.
    pts = np.array([[20.0, 0.0, -1.0]])
    rect = calib.velo_to_rect(pts)
    assert rect[0, 2] > 0                      # depth positive
    uv = calib.velo_to_image(pts)
    assert 0 < uv[0, 0] < IMG_W and 0 < uv[0, 1] < IMG_H
    # Composed matrix equals the two-step path.
    proj = calib.projection_matrix()
    hom = np.concatenate([pts, [[1.0]]], axis=1)
    uvw = hom @ proj.T
    np.testing.assert_allclose(uvw[:, :2] / uvw[:, 2:3], uv, rtol=1e-6)


@pytest.fixture
def kitti_tree(tmp_path):
    from PIL import Image

    root = str(tmp_path / "kitti")
    seq = "0000"
    for sub in ("image_02/0000", "velodyne/0000", "label_02", "calib"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    rng = np.random.default_rng(0)
    T = 3
    for t in range(T):
        img = rng.integers(0, 255, (375, 1242, 3)).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(root, f"image_02/{seq}/{t:06d}.png"))
        pc = np.zeros((100, 4), np.float32)
        pc[:, 0] = rng.uniform(5, 40, 100)       # x forward
        pc[:, 1] = rng.uniform(-10, 10, 100)
        pc[:, 2] = rng.uniform(-2, 1, 100)
        pc[:, 3] = rng.uniform(0, 1, 100)
        pc.tofile(os.path.join(root, f"velodyne/{seq}/{t:06d}.bin"))
    objs = []
    for t in range(T):
        objs.append(KittiObject(frame=t, track_id=1, obj_type="Car",
                                bbox=np.array([100, 150, 220, 230.0])))
        if t > 0:
            objs.append(KittiObject(frame=t, track_id=2, obj_type="Car",
                                    bbox=np.array([400, 160, 520, 240.0])))
        objs.append(KittiObject(frame=t, track_id=3,
                                obj_type="Pedestrian",
                                bbox=np.array([600, 100, 630, 180.0])))
    write_kitti_result(objs, os.path.join(root, "label_02", f"{seq}.txt"))
    _write_calib(os.path.join(root, "calib", f"{seq}.txt"))
    return root


def test_packer_oracle_mode(kitti_tree):
    # cloud_filter=none: this test asserts RAW cloud packing; the default
    # box filter is covered by test_cloud_filter_* below.
    cfg = DataConfig(root=kitti_tree, max_dets=8, cloud_filter="none")
    ds = KittiTrackingDataset(cfg, max_cloud_points=256)
    assert ds.sequences == ["0000"]
    arrs = ds.load_sequence("0000")
    assert arrs.images.shape == (3, IMG_H, IMG_W, 3)
    assert arrs.clouds.shape == (3, 256, 4)
    # Frame 0 has 1 Car (pedestrian filtered), frames 1-2 have 2.
    assert arrs.det_mask.sum(axis=1).tolist() == [1, 2, 2]
    assert arrs.gt_ids[0, 0] == 1
    assert set(arrs.gt_ids[1, :2].tolist()) == {1, 2}
    assert arrs.cloud_valid[0].sum() == 100
    # Projection maps forward points into the image.
    from mmmot_tpu.data.calib import Calibration

    pc = arrs.clouds[0][arrs.cloud_valid[0]]
    hom = np.concatenate([pc[:, :3], np.ones((len(pc), 1))], 1)
    uvw = hom @ arrs.proj.T
    uv = uvw[:, :2] / uvw[:, 2:3]
    assert ((uv[:, 0] > -2000) & (uv[:, 0] < 4000)).all()


def test_training_pairs(kitti_tree):
    cfg = DataConfig(root=kitti_tree, max_dets=8)
    ds = KittiTrackingDataset(cfg, max_cloud_points=128)
    pairs = list(ds.training_pairs("0000", np.random.default_rng(0), 2))
    assert len(pairs) == 2
    for p in pairs:
        assert p.images.shape[0] == 2


def test_gt_matching_one_to_one(kitti_tree):
    """Two detections overlapping one GT: only one may take its track id."""
    det_dir = os.path.join(kitti_tree, "detections", "pointpillars")
    os.makedirs(det_dir, exist_ok=True)
    # Frame 0 GT: single Car id=1 at [100, 150, 220, 230].  Two near-identical
    # detections both overlap it above 0.5 IoU; argmax matching would hand
    # id=1 to both.
    dets = [
        KittiObject(frame=0, track_id=-1, obj_type="Car", score=0.9,
                    bbox=np.array([100, 150, 220, 230.0])),
        KittiObject(frame=0, track_id=-1, obj_type="Car", score=0.8,
                    bbox=np.array([104, 152, 224, 232.0])),
    ]
    write_kitti_result(dets, os.path.join(det_dir, "0000.txt"))
    cfg = DataConfig(root=kitti_tree, max_dets=8)
    ds = KittiTrackingDataset(cfg, max_cloud_points=128)
    arrs = ds.load_sequence("0000", max_frames=1)
    assigned = arrs.gt_ids[0][arrs.det_mask[0]]
    assert (assigned == 1).sum() == 1          # exactly one det owns GT 1
    assert (assigned == -1).sum() == 1         # the other is unmatched
    # And the exact-overlap det (higher IoU) is the one that wins.
    assert arrs.gt_ids[0, 0] == 1


def test_missing_tree_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        KittiTrackingDataset(DataConfig(root=str(tmp_path / "nope")))


def test_detection_pickle_conversion(tmp_path, kitti_tree):
    """Pickle detections (both layouts) -> det txt -> dataset consumption."""
    import pickle

    from mmmot_tpu.data.det_convert import convert_detection_pickle

    # Layout A: {frame: ndarray [n, 5]} with scores.
    dets_a = {0: np.array([[100, 150, 220, 230, 0.9],
                           [400, 160, 520, 240, 0.4]]),
              1: np.array([[102, 151, 221, 231, 0.8]])}
    pa = str(tmp_path / "a.pkl")
    pickle.dump(dets_a, open(pa, "wb"))
    det_dir = os.path.join(kitti_tree, "detections", "pointpillars")
    os.makedirs(det_dir, exist_ok=True)
    out_a = os.path.join(det_dir, "0000.txt")
    n = convert_detection_pickle(pa, out_a, min_score=0.5)
    assert n == 2                      # 0.4-score det filtered

    cfg = DataConfig(root=kitti_tree, max_dets=8)
    ds = KittiTrackingDataset(cfg, max_cloud_points=128)
    arrs = ds.load_sequence("0000")
    assert arrs.det_mask[0].sum() == 1 and arrs.det_mask[1].sum() == 1
    assert arrs.scores[0, 0] == np.float32(0.9)

    # Layout B: dict entries with 3D fields.
    dets_b = {0: {"bbox": np.array([[10, 10, 40, 40.0]]),
                  "scores": np.array([0.7]),
                  "dimensions": np.array([[2.0, 4.0, 4.0]]),
                  "location": np.array([[0.0, 1.0, 15.0]]),
                  "rotation_y": np.array([0.1])}}
    pb = str(tmp_path / "b.pkl")
    pickle.dump(dets_b, open(pb, "wb"))
    out_b = os.path.join(det_dir, "0000.txt")
    convert_detection_pickle(pb, out_b)
    arrs = ds.load_sequence("0000", max_frames=1)
    assert bool(arrs.has_3d[0, 0])
    np.testing.assert_allclose(arrs.boxes3d[0, 0, :3], [2.0, 4.0, 4.0])


def test_cloud_filter_preserves_frustum_samples(kitti_tree):
    """cloud_filter='boxes': per-detection device frustum samples are
    IDENTICAL to the unfiltered load (the host filter is a superset of
    the device criterion, scan order preserved), the padded M shrinks to
    a 4096 bucket, and box points beyond a raw [:M] truncation — a KITTI
    scan is ~120k azimuth-ordered points — are recovered."""
    import jax.numpy as jnp

    from mmmot_tpu.ops.frustum import frustum_sample_batched

    cfg_f = DataConfig(root=kitti_tree, max_dets=8, cloud_filter="boxes")
    cfg_n = DataConfig(root=kitti_tree, max_dets=8, cloud_filter="none")
    a_f = KittiTrackingDataset(cfg_f, max_cloud_points=8192).load_sequence(
        "0000")
    a_n = KittiTrackingDataset(cfg_n, max_cloud_points=8192).load_sequence(
        "0000")
    assert a_f.clouds.shape[1] == 4096          # bucketed
    assert a_n.clouds.shape[1] == 8192          # raw M

    def samples(a):
        pts, pm = frustum_sample_batched(
            jnp.asarray(a.clouds), jnp.asarray(a.boxes),
            jnp.asarray(a.proj), 32, det_mask=jnp.asarray(a.det_mask),
            point_valid=jnp.asarray(a.cloud_valid))
        return np.asarray(pts), np.asarray(pm)

    pf, mf = samples(a_f)
    pn, mn = samples(a_n)
    np.testing.assert_array_equal(mf, mn)
    np.testing.assert_allclose(pf, pn, atol=1e-6)
    # Some points survive the filter (boxes over the road ahead).
    assert a_f.cloud_valid.sum() > 0


def test_cloud_filter_recovers_truncated_box_points(tmp_path):
    """A scan whose box points all sit BEYOND max_cloud_points: raw [:M]
    truncation loses every one; the filter keeps them."""
    from PIL import Image

    root = str(tmp_path / "kitti")
    seq = "0000"
    for sub in ("image_02/0000", "velodyne/0000", "label_02", "calib"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    img = np.zeros((375, 1242, 3), np.uint8)
    Image.fromarray(img).save(
        os.path.join(root, f"image_02/{seq}/000000.png"))
    # 5000 far-left points (outside the box), then 100 points straight
    # ahead (inside the box) — all past an M=1024 truncation.
    pc = np.zeros((5100, 4), np.float32)
    pc[:5000, 0] = 10.0
    pc[:5000, 1] = 50.0        # far left, projects outside the image
    pc[5000:, 0] = 20.0        # straight ahead
    pc[5000:, 2] = -1.0
    pc.tofile(os.path.join(root, f"velodyne/{seq}/000000.bin"))
    objs = [KittiObject(frame=0, track_id=1, obj_type="Car",
                        bbox=np.array([500, 100, 700, 300.0]))]
    write_kitti_result(objs, os.path.join(root, "label_02", f"{seq}.txt"))
    _write_calib(os.path.join(root, "calib", f"{seq}.txt"))

    a_n = KittiTrackingDataset(
        DataConfig(root=root, max_dets=4, cloud_filter="none"),
        max_cloud_points=1024).load_sequence(seq)
    a_f = KittiTrackingDataset(
        DataConfig(root=root, max_dets=4, cloud_filter="boxes"),
        max_cloud_points=1024).load_sequence(seq)
    # Raw truncation kept only out-of-box points; the filter kept the
    # 100 in-box points.
    assert a_n.cloud_valid.sum() == 1024
    assert (a_n.clouds[0, :, 1] > 40).all()     # all far-left points
    assert a_f.cloud_valid.sum() == 100
    assert (np.abs(a_f.clouds[0, :100, 1]) < 1).all()  # the box points
