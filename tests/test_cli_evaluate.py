"""Standalone devkit CLI (``mmmot-eval`` / ``python -m
mmmot_tpu.cli.evaluate``) — reference parity: invoking the devkit on an
existing result sha without re-running the tracker (SURVEY §2.17/§3.5)."""

import os

import pytest

from mmmot_tpu.cli.evaluate import main


def _write(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        for r in rows:
            fh.write(r + "\n")


GT = [
    # frame id type trunc occ alpha l t r b h w l3 x y z ry
    "0 1 Car 0 0 0.0 100 100 200 200 1.5 1.6 4.0 0.0 1.0 15.0 0.0",
    "1 1 Car 0 0 0.0 105 100 205 200 1.5 1.6 4.0 0.0 1.0 14.0 0.0",
    "2 1 Car 0 0 0.0 110 100 210 200 1.5 1.6 4.0 0.0 1.0 13.0 0.0",
]


def _res(rows):
    return [r + " 0.9" for r in rows]  # result txt carries a score column


@pytest.fixture()
def tree(tmp_path):
    gt_dir = str(tmp_path / "label_02")
    res_dir = str(tmp_path / "results")
    _write(os.path.join(gt_dir, "0000.txt"), GT)
    _write(os.path.join(res_dir, "0000.txt"), _res(GT))
    return gt_dir, res_dir


def test_perfect_result_scores_mota_1(tree, capsys):
    gt_dir, res_dir = tree
    assert main(["--gt", gt_dir, "--results", res_dir,
                 "--per-sequence", "--summary"]) == 0
    out = capsys.readouterr().out
    assert "== car (1 sequences) ==" in out
    assert "MOTA" in out and "0000:" in out
    # --summary writes the devkit stats block next to the results.
    assert os.path.exists(os.path.join(res_dir, "summary_car.txt"))


def test_discovers_common_sequences_only(tree, capsys):
    gt_dir, res_dir = tree
    # GT-only sequence must not be scored (no result txt for it).
    _write(os.path.join(gt_dir, "0001.txt"), GT)
    assert main(["--gt", gt_dir, "--results", res_dir]) == 0
    assert "(1 sequences)" in capsys.readouterr().out


def test_missing_named_sequence_exits(tree):
    gt_dir, res_dir = tree
    with pytest.raises(SystemExit):
        main(["--gt", gt_dir, "--results", res_dir,
              "--sequences", "0000,0099"])


def test_seqmap_supplies_sequence_list(tree, tmp_path, capsys):
    gt_dir, res_dir = tree
    # Both dirs also hold 0001, but the seqmap names only 0000.
    _write(os.path.join(gt_dir, "0001.txt"), GT)
    _write(os.path.join(res_dir, "0001.txt"), _res(GT))
    seqmap = tmp_path / "evaluate_tracking.seqmap.training"
    seqmap.write_text("0000 empty 000000 000003\n")
    assert main(["--gt", gt_dir, "--results", res_dir,
                 "--seqmap", str(seqmap)]) == 0
    assert "(1 sequences)" in capsys.readouterr().out


def test_seqmap_frame_count_drives_far(tmp_path, capsys):
    """The seqmap's n_frames is the FAR denominator (devkit n_frames)."""
    gt_dir = str(tmp_path / "label_02")
    res_dir = str(tmp_path / "results")
    _write(os.path.join(gt_dir, "0000.txt"), GT)
    # One spurious far-away box per frame -> 3 FPs.
    fp_rows = [r.replace(" 100 100 200 200 ", " 700 100 800 200 ")
               for r in GT]
    _write(os.path.join(res_dir, "0000.txt"), _res(GT + fp_rows))
    seqmap = tmp_path / "seqmap"
    seqmap.write_text("0000 empty 000000 000030\n")
    from mmmot_tpu.eval import evaluate_tracking
    with_map = evaluate_tracking(gt_dir, res_dir, ["0000"],
                                 num_frames={"0000": 30})
    without = evaluate_tracking(gt_dir, res_dir, ["0000"])
    assert with_map.fp == without.fp == 3
    # FAR = FP / n_frames: 3 FP over 30 frames vs over 3 inferred frames.
    assert abs(with_map.far - without.far / 10) < 1e-9


def test_seqmap_rejects_malformed(tmp_path):
    bad = tmp_path / "seqmap"
    bad.write_text("0000 empty 000000\n")
    from mmmot_tpu.eval import read_seqmap
    with pytest.raises(ValueError):
        read_seqmap(str(bad))


def test_empty_intersection_exits(tmp_path):
    gt_dir = str(tmp_path / "label_02")
    res_dir = str(tmp_path / "results")
    os.makedirs(gt_dir)
    os.makedirs(res_dir)
    with pytest.raises(SystemExit):
        main(["--gt", gt_dir, "--results", res_dir])


def test_hota_flag(tree, capsys):
    gt_dir, res_dir = tree
    assert main(["--gt", gt_dir, "--results", res_dir,
                 "--hota", "--summary"]) == 0
    out = capsys.readouterr().out
    assert "HOTA" in out and "AssA" in out
    # A perfect result scores HOTA 1 and writes the hota summary file.
    assert " 1.000000" in out.split("HOTA evaluation summary")[1]
    assert os.path.exists(os.path.join(res_dir, "hota_car.txt"))
