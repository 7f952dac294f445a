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
    entries = [e for e in os.listdir(packed_dir) if e != "frames"]
    assert len(entries) == 1 and entries[0].startswith("0000-")

    ds2 = KittiTrackingDataset(_cfg(root), max_cloud_points=256)
    cached = ds2.load_sequence("0000")        # hit
    assert isinstance(cached.images, np.memmap)
    assert isinstance(cached.clouds, np.memmap)
    for f in FIELDS:
        a, b = getattr(fresh, f), getattr(cached, f)
        assert np.array_equal(np.asarray(a), np.asarray(b)), f
    # hit did not write a second entry
    assert [e for e in os.listdir(packed_dir) if e != "frames"] == entries


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
    assert len([e for e in os.listdir(os.path.join(root, ".packed"))
                if e != "frames"]) == 2


def test_training_pairs_never_sequence_cached(tmp_path):
    """Pair loads (random offsets) must not mint whole-sequence entries —
    only the frame-level decode cache."""
    root = build_kitti_tree(tmp_path)
    ds = KittiTrackingDataset(_cfg(root), max_cloud_points=256)
    rng = np.random.default_rng(0)
    for _ in ds.training_pairs("0000", rng, num_pairs=3):
        pass
    entries = os.listdir(os.path.join(root, ".packed"))
    assert entries == ["frames"]


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


def test_frame_decode_cache_for_training_pairs(tmp_path):
    """Training pairs (random offsets) use the FRAME-level decode cache:
    identical pixels, one .npy per decoded frame, stale source re-keys."""
    root = build_kitti_tree(tmp_path)
    ds = KittiTrackingDataset(_cfg(root), max_cloud_points=256)
    rng = np.random.default_rng(1)
    fresh = [p.images.copy() for p in ds.training_pairs("0000", rng, 3)]
    fdir = os.path.join(root, ".packed", "frames", "0000")
    assert os.path.isdir(fdir) and len(os.listdir(fdir)) >= 2

    ds2 = KittiTrackingDataset(_cfg(root), max_cloud_points=256)
    rng2 = np.random.default_rng(1)
    hit = [p.images.copy() for p in ds2.training_pairs("0000", rng2, 3)]
    for a, b in zip(fresh, hit):
        assert np.array_equal(a, b)

    # whole-sequence cache still untouched by pair loads
    assert all(e == "frames"
               for e in os.listdir(os.path.join(root, ".packed")))

    # a re-encoded source frame gets its own cache entry (stale never hit)
    from PIL import Image

    f0 = os.path.join(root, "image_02", "0000", "000000.png")
    img = np.asarray(Image.open(f0)).copy()
    img[:8] = 255
    Image.fromarray(img).save(f0)
    os.utime(f0, ns=(2, 2))
    ds3 = KittiTrackingDataset(_cfg(root), max_cloud_points=256)
    arr = ds3.load_sequence("0000", start=0, max_frames=1)
    # only the real 48x96 frame area — the padded canvas stays zero
    assert (np.asarray(arr.images[0, :8, :96]) == 255).all()
