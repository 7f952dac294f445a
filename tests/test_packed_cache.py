"""Persistent packed-sequence cache (data/packed_cache.py).

A cache hit must return byte-identical arrays to a fresh pack (memmapped),
regenerated detections must invalidate the key, training-pair loads must
never populate the cache, and the CLI path must produce identical result
txts with the cache on."""

import dataclasses
import os

import numpy as np

from mmmot_tpu.config import DataConfig
from mmmot_tpu.data.kitti_dataset import KittiTrackingDataset

from tests.test_cli_track import build_kitti_tree

FIELDS = ("images", "clouds", "cloud_valid", "boxes", "det_mask", "scores",
          "gt_ids", "proj", "frame_ids", "boxes3d", "has_3d",
          "velo_to_rect")


def _cfg(root, **kw):
    return DataConfig(root=root, max_dets=4, crop_size=(32, 32),
                      point_len=16, packed_cache=True, **kw)


def test_pack_roundtrip_and_memmap(tmp_path):
    root = build_kitti_tree(tmp_path)
    ds = KittiTrackingDataset(_cfg(root), max_cloud_points=256)
    fresh = ds.load_sequence("0000")          # packs + persists
    packed_dir = os.path.join(root, ".packed")
    entries = os.listdir(packed_dir)
    assert len(entries) == 1 and entries[0].startswith("0000-")

    ds2 = KittiTrackingDataset(_cfg(root), max_cloud_points=256)
    cached = ds2.load_sequence("0000")        # hit
    assert isinstance(cached.images, np.memmap)
    assert isinstance(cached.clouds, np.memmap)
    for f in FIELDS:
        a, b = getattr(fresh, f), getattr(cached, f)
        assert np.array_equal(np.asarray(a), np.asarray(b)), f
    # hit did not write a second entry
    assert os.listdir(packed_dir) == entries


def test_regenerated_detections_invalidate(tmp_path):
    root = build_kitti_tree(tmp_path)
    ds = KittiTrackingDataset(_cfg(root), max_cloud_points=256)
    before = ds.load_sequence("0000")

    # regenerate the oracle source (label_02 doubles as detections): drop
    # every second line and make the file clearly newer
    lbl = os.path.join(root, "label_02", "0000.txt")
    lines = open(lbl).read().splitlines()
    with open(lbl, "w") as fh:
        fh.write("\n".join(lines[::2]) + "\n")
    os.utime(lbl, ns=(1, 1))   # distinct mtime even on coarse filesystems

    ds2 = KittiTrackingDataset(_cfg(root), max_cloud_points=256)
    after = ds2.load_sequence("0000")
    assert not np.array_equal(before.det_mask, after.det_mask), \
        "stale cache served after detections changed"
    assert len(os.listdir(os.path.join(root, ".packed"))) == 2


def test_training_pairs_never_cached(tmp_path):
    root = build_kitti_tree(tmp_path)
    ds = KittiTrackingDataset(_cfg(root), max_cloud_points=256)
    rng = np.random.default_rng(0)
    for _ in ds.training_pairs("0000", rng, num_pairs=3):
        pass
    assert not os.path.isdir(os.path.join(root, ".packed"))


def test_cli_packed_cache_identical_results(tmp_path):
    import yaml

    from mmmot_tpu.cli.track import main

    root = build_kitti_tree(tmp_path)
    base = yaml.safe_load(open("experiments/tiny_debug/config.yaml"))
    base["data"] = {"max_dets": 4, "crop_size": [32, 32], "point_len": 16,
                    "root": root}
    base["name"] = "tiny_kitti_packed"
    cfg_path = str(tmp_path / "config.yaml")
    yaml.safe_dump(base, open(cfg_path, "w"))

    def run(tag, *extra):
        main(["--config", cfg_path, "--cpu", "--window", "2", "--no-eval",
              "--result-path", str(tmp_path / tag), *extra])
        return {s: (tmp_path / tag / "tiny_kitti_packed" / "latest"
                    / f"{s}.txt").read_text() for s in ("0000", "0001")}

    plain = run("plain")
    cold = run("cold", "--packed-cache")     # packs
    warm = run("warm", "--packed-cache")     # memmap hit
    assert cold == plain and warm == plain
    assert os.path.isdir(os.path.join(root, ".packed"))
