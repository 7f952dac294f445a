"""Real-KITTI tracking CLI: windowed streaming, one program per density.

VERDICT r1 item 8: the eval CLI must not recompile per sequence.  The
fabricated tree here has two sequences of different lengths; both must run
through the SAME compiled window program (state carried across windows),
with oracle detections scoring MOTA 1.0.
"""

import os

import numpy as np
import pytest

from mmmot_tpu.data.kitti_io import KittiObject, write_kitti_result

P2 = np.array([[50.0, 0.0, 48.0, 0.0],
               [0.0, 50.0, 24.0, 0.0],
               [0.0, 0.0, 1.0, 0.0]])


def _write_calib(path):
    with open(path, "w") as f:
        f.write("P2: " + " ".join(str(x) for x in P2.ravel()) + "\n")
        f.write("R_rect " + " ".join(str(x) for x in np.eye(3).ravel())
                + "\n")
        f.write("Tr_velo_cam " + " ".join(
            str(x) for x in np.array([[0.0, -1, 0, 0], [0, 0, -1, 0],
                                      [1, 0, 0, 0]]).ravel()) + "\n")


def build_kitti_tree(tmp_path):
    from PIL import Image

    root = str(tmp_path / "kitti")
    rng = np.random.default_rng(0)
    for seq, T in (("0000", 5), ("0001", 3)):
        for sub in (f"image_02/{seq}", f"velodyne/{seq}"):
            os.makedirs(os.path.join(root, sub), exist_ok=True)
        os.makedirs(os.path.join(root, "label_02"), exist_ok=True)
        os.makedirs(os.path.join(root, "calib"), exist_ok=True)
        objs = []
        for t in range(T):
            img = rng.integers(0, 255, (48, 96, 3)).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(root, f"image_02/{seq}/{t:06d}.png"))
            pc = np.zeros((64, 4), np.float32)
            pc[:, 0] = rng.uniform(5, 30, 64)
            pc[:, 1] = rng.uniform(-5, 5, 64)
            pc[:, 2] = rng.uniform(-1, 1, 64)
            pc.tofile(os.path.join(root, f"velodyne/{seq}/{t:06d}.bin"))
            objs.append(KittiObject(frame=t, track_id=1, obj_type="Car",
                                    bbox=np.array([10, 10, 40, 40.0]),
                                    dimensions=np.array([2.0, 4.0, 4.0]),
                                    location=np.array([0.0, 1.0, 15.0]),
                                    rotation_y=0.1))
            objs.append(KittiObject(frame=t, track_id=2, obj_type="Car",
                                    bbox=np.array([50, 8, 80, 38.0]),
                                    dimensions=np.array([2.0, 4.0, 4.0]),
                                    location=np.array([-3.0, 1.0, 20.0]),
                                    rotation_y=-0.2))
            objs.append(KittiObject(frame=t, track_id=3,
                                    obj_type="Pedestrian",
                                    bbox=np.array([60, 20, 70, 44.0]),
                                    dimensions=np.array([1.8, 0.6, 0.6]),
                                    location=np.array([2.0, 1.0, 12.0]),
                                    rotation_y=0.0))
        write_kitti_result(objs, os.path.join(root, "label_02",
                                              f"{seq}.txt"))
        _write_calib(os.path.join(root, "calib", f"{seq}.txt"))
    return root


@pytest.fixture
def kitti_tree(tmp_path):
    return build_kitti_tree(tmp_path)


def test_windowed_streaming_single_program(kitti_tree, tmp_path):
    import yaml

    from mmmot_tpu.cli.track import main

    base = yaml.safe_load(open("experiments/tiny_debug/config.yaml"))
    base["data"] = {"max_dets": 4, "crop_size": [32, 32], "point_len": 16,
                    "root": kitti_tree}
    base["name"] = "tiny_kitti_cli"
    cfg_path = str(tmp_path / "config.yaml")
    yaml.safe_dump(base, open(cfg_path, "w"))

    stats = main(["--config", cfg_path, "--cpu", "--window", "2",
                  "--result-path", str(tmp_path / "results")])
    # 5-frame and 3-frame sequences share ONE compiled window program.
    assert stats["n_programs"] == 1
    assert stats["n_dropped"] == 0
    res_dir = tmp_path / "results" / "tiny_kitti_cli" / "latest"
    assert (res_dir / "0000.txt").exists()
    assert (res_dir / "0001.txt").exists()
    assert (res_dir / "summary_car.txt").exists()
    # Oracle detections with a random-init net still produce output rows
    # for every frame; IDs must be consistent within a window chain
    # (monotone non-negative ints), and all 5 frames of 0000 are present.
    from mmmot_tpu.data.kitti_io import read_kitti_tracking_labels

    frames = read_kitti_tracking_labels(str(res_dir / "0000.txt"))
    assert set(frames) == {0, 1, 2, 3, 4}
    for objs in frames.values():
        assert all(o.track_id >= 0 for o in objs)
        # The detections' 3D boxes propagate into the result rows
        # (reference results carry the detector's 3D fields; the KITTI
        # 3D tracking eval reads them).
        assert all(o.rotation_y > -10.0 and float(o.dimensions.max()) > 0
                   for o in objs)


def test_windowed_streaming_box3d_points(kitti_tree, tmp_path):
    """point_source=box3d: points-in-3D-box extraction end-to-end."""
    import yaml

    from mmmot_tpu.cli.track import main

    base = yaml.safe_load(open("experiments/tiny_debug/config.yaml"))
    base["data"] = {"max_dets": 4, "crop_size": [32, 32], "point_len": 16,
                    "root": kitti_tree, "point_source": "box3d"}
    base["name"] = "tiny_kitti_b3d"
    cfg_path = str(tmp_path / "config.yaml")
    yaml.safe_dump(base, open(cfg_path, "w"))

    stats = main(["--config", cfg_path, "--cpu", "--window", "4",
                  "--result-path", str(tmp_path / "results")])
    assert stats["n_programs"] == 1 and stats["n_dropped"] == 0
    res_dir = tmp_path / "results" / "tiny_kitti_b3d" / "latest"
    assert (res_dir / "0000.txt").exists()


def test_batched_sequences_identical(kitti_tree, tmp_path):
    """--batch-sequences 2: both sequences through ONE vmapped window
    program, with result files identical to the serial path."""
    import yaml

    from mmmot_tpu.cli.track import main

    base = yaml.safe_load(open("experiments/tiny_debug/config.yaml"))
    base["data"] = {"max_dets": 4, "crop_size": [32, 32], "point_len": 16,
                    "root": kitti_tree}
    base["name"] = "tiny_kitti_batched"
    cfg_path = str(tmp_path / "config.yaml")
    yaml.safe_dump(base, open(cfg_path, "w"))

    s1 = main(["--config", cfg_path, "--cpu", "--window", "2",
               "--result-path", str(tmp_path / "serial")])
    s2 = main(["--config", cfg_path, "--cpu", "--window", "2",
               "--batch-sequences", "2",
               "--result-path", str(tmp_path / "batched")])
    assert s2["n_dropped"] == 0
    assert s2["n_programs"] == 1          # one vmapped program for both
    for seq in ("0000", "0001"):
        a = (tmp_path / "serial" / "tiny_kitti_batched" / "latest"
             / f"{seq}.txt").read_text()
        b = (tmp_path / "batched" / "tiny_kitti_batched" / "latest"
             / f"{seq}.txt").read_text()
        assert a == b, f"batched result differs for {seq}"
    assert s1["metrics"].mota == s2["metrics"].mota


def test_track_class_pedestrian(kitti_tree, tmp_path):
    """track_class=Pedestrian: dataset filters ped dets, runner writes
    Pedestrian-typed rows, devkit scores the pedestrian class."""
    import yaml

    from mmmot_tpu.cli.track import main
    from mmmot_tpu.data.kitti_io import read_kitti_tracking_labels

    base = yaml.safe_load(open("experiments/tiny_debug/config.yaml"))
    base["data"] = {"max_dets": 4, "crop_size": [32, 32], "point_len": 16,
                    "root": kitti_tree, "track_class": "Pedestrian"}
    base["name"] = "tiny_kitti_ped"
    cfg_path = str(tmp_path / "config.yaml")
    yaml.safe_dump(base, open(cfg_path, "w"))

    stats = main(["--config", cfg_path, "--cpu", "--window", "2",
                  "--result-path", str(tmp_path / "results")])
    assert stats["n_dropped"] == 0
    res_dir = tmp_path / "results" / "tiny_kitti_ped" / "latest"
    assert (res_dir / "summary_pedestrian.txt").exists()
    frames = read_kitti_tracking_labels(str(res_dir / "0000.txt"))
    objs = [o for f in frames.values() for o in f]
    assert objs and all(o.obj_type == "Pedestrian" for o in objs)
    # One ped per frame (cars filtered out), oracle dets -> recall 1.0.
    assert all(len(f) == 1 for f in frames.values())
    m = stats["metrics"]
    assert m.recall == 1.0


def test_crop_window_sizing():
    """Band width covers the widest box, bucketed to 128, frame-capped."""
    from mmmot_tpu.tracker.kitti_runner import _crop_window

    boxes = np.zeros((2, 3, 4), np.float32)
    mask = np.zeros((2, 3), bool)
    boxes[0, 0] = [100, 10, 420, 60]           # 320 wide
    mask[0, 0] = True
    assert _crop_window(boxes, mask, 1248) == 384      # rounded to 128
    boxes[1, 1] = [100, 10, 800, 60]           # 700 wide
    mask[1, 1] = True
    assert _crop_window(boxes, mask, 1248) == 768      # rounded to 128
    assert _crop_window(boxes, mask, 640) == 640       # frame cap
    assert _crop_window(boxes, ~mask & False, 1248) == 256  # floor, no boxes
    boxes[0, 0] = [100, 10, 250, 60]           # 150 wide
    assert _crop_window(boxes[:1], mask[:1], 1248) == 256  # floor


def test_dead_sensor_real_path(kitti_tree, tmp_path):
    """--dead-sensor camera/lidar: the raw-frames streaming pipeline runs
    single-modality (fusion keeps per-modality branches live) and still
    produces tracks for every frame."""
    import yaml

    from mmmot_tpu.cli.track import main
    from mmmot_tpu.data.kitti_io import read_kitti_tracking_labels

    base = yaml.safe_load(open("experiments/tiny_debug/config.yaml"))
    base["data"] = {"max_dets": 4, "crop_size": [32, 32], "point_len": 16,
                    "root": kitti_tree}
    base["name"] = "tiny_kitti_dead"
    cfg_path = str(tmp_path / "config.yaml")
    yaml.safe_dump(base, open(cfg_path, "w"))

    for sensor in ("camera", "lidar"):
        stats = main(["--config", cfg_path, "--cpu", "--window", "4",
                      "--dead-sensor", sensor, "--sequences", "0000",
                      "--result-path", str(tmp_path / sensor)])
        assert stats["n_dropped"] == 0
        res = (tmp_path / sensor / "tiny_kitti_dead" / "latest"
               / "0000.txt")
        frames = read_kitti_tracking_labels(str(res))
        assert set(frames) == {0, 1, 2, 3, 4}

    # Sequential-scan variant (use_det_scores forces it): the carried
    # TrackerState's feats pytree must match the single-modality forward
    # (regression: init_state carried the dead branch and lax.scan
    # rejected the carry structure).
    base["assoc"] = {"solver": "auction", "use_det_scores": True}
    base["name"] = "tiny_kitti_dead_seq"
    cfg_path2 = str(tmp_path / "config2.yaml")
    yaml.safe_dump(base, open(cfg_path2, "w"))
    stats = main(["--config", cfg_path2, "--cpu", "--window", "4",
                  "--dead-sensor", "camera", "--sequences", "0000",
                  "--result-path", str(tmp_path / "seqscan")])
    assert stats["n_dropped"] == 0


def test_batched_sequences_mixed_cloud_buckets(kitti_tree, tmp_path,
                                               monkeypatch):
    """A vmapped group whose members carry DIFFERENT cloud paddings
    (cloud_filter buckets M per sequence) must harmonize shapes and give
    results identical to the uniform-padding run."""
    import dataclasses

    import yaml

    from mmmot_tpu.cli.track import main
    from mmmot_tpu.data.kitti_dataset import KittiTrackingDataset

    base = yaml.safe_load(open("experiments/tiny_debug/config.yaml"))
    base["data"] = {"max_dets": 4, "crop_size": [32, 32], "point_len": 16,
                    "root": kitti_tree}
    base["name"] = "tiny_kitti_mixm"
    cfg_path = str(tmp_path / "config.yaml")
    yaml.safe_dump(base, open(cfg_path, "w"))

    ref = main(["--config", cfg_path, "--cpu", "--window", "2",
                "--batch-sequences", "2",
                "--result-path", str(tmp_path / "uniform")])

    orig = KittiTrackingDataset.load_sequence

    def padded(self, seq, **kw):
        a = orig(self, seq, **kw)
        if seq == "0001":
            # Same content, wider zero padding -> different per-member M.
            import numpy as np

            T, M = a.cloud_valid.shape
            cl = np.zeros((T, M + 128, 4), np.float32)
            cv = np.zeros((T, M + 128), bool)
            cl[:, :M] = a.clouds
            cv[:, :M] = a.cloud_valid
            a = dataclasses.replace(a, clouds=cl, cloud_valid=cv)
        return a

    monkeypatch.setattr(KittiTrackingDataset, "load_sequence", padded)
    mix = main(["--config", cfg_path, "--cpu", "--window", "2",
                "--batch-sequences", "2",
                "--result-path", str(tmp_path / "mixed")])
    assert mix["n_dropped"] == 0
    for seq in ("0000", "0001"):
        a = (tmp_path / "uniform" / "tiny_kitti_mixm" / "latest"
             / f"{seq}.txt").read_text()
        b = (tmp_path / "mixed" / "tiny_kitti_mixm" / "latest"
             / f"{seq}.txt").read_text()
        assert a == b, f"mixed-bucket result differs for {seq}"
    assert ref["metrics"].mota == mix["metrics"].mota


def test_window_cache_keyed_on_config(kitti_tree, tmp_path):
    """The compiled-window cache keys on the model CONFIG, not id(net):
    a fresh equal-config net (possibly allocated at a dead net's address —
    CPython reuses ids) hits the shared program; a different architecture
    gets its own entry (VERDICT r2 weak #2)."""
    import dataclasses
    import gc

    import jax

    from mmmot_tpu.configs import tiny
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import TrackingModule
    from mmmot_tpu.tracker import kitti_runner

    cfg = tiny()
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, max_dets=4, crop_size=(32, 32), point_len=16,
        root=kitti_tree))

    def make_module(model_cfg):
        import jax.numpy as jnp

        net = model_entry(model_cfg)
        N, P = cfg.data.max_dets, cfg.data.point_len
        dummy = {
            "crops": jnp.zeros((1, 2, N, 32, 32, 3)),
            "points": jnp.zeros((1, 2, N, P, 4)),
            "point_mask": jnp.ones((1, 2, N, P), bool),
            "det_mask": jnp.ones((1, 2, N), bool),
        }
        variables = net.init({"params": jax.random.PRNGKey(0)}, dummy,
                             train=False)
        return TrackingModule(net, variables, cfg.assoc)

    def run(module, tag):
        return kitti_runner.track_kitti_sequences(
            module, cfg.data, str(tmp_path / tag), sequences=["0000"],
            window=4, evaluate=False)

    mod1 = make_module(cfg.model)
    run(mod1, "a")
    n1 = len(kitti_runner._WINDOW_FNS)

    # Fresh net object, identical config: must HIT the cache (no growth).
    del mod1
    gc.collect()
    mod2 = make_module(cfg.model)
    run(mod2, "b")
    assert len(kitti_runner._WINDOW_FNS) == n1, \
        "equal-config module missed the window cache"

    # Different architecture: must MISS (own entry), not reuse a stale
    # program via an aliased key.
    cfg3 = dataclasses.replace(
        cfg.model, affinity=dataclasses.replace(cfg.model.affinity,
                                                hidden_dim=8))
    mod3 = make_module(cfg3)
    run(mod3, "c")
    assert len(kitti_runner._WINDOW_FNS) == n1 + 1, \
        "different-architecture module did not get its own program"


def test_revival_window_streams_through_runner(kitti_tree, tmp_path):
    """revival_window through the real windowed KITTI runner: the ghost
    pool (2N-slot state incl. missed counters) carries across windows and
    the pipeline still scores perfectly on oracle detections."""
    import yaml

    from mmmot_tpu.cli.track import main

    base = yaml.safe_load(open("experiments/tiny_debug/config.yaml"))
    base["data"] = {"max_dets": 4, "crop_size": [32, 32], "point_len": 16,
                    "root": kitti_tree}
    base["assoc"] = {"solver": "auction", "revival_window": 2}
    base["name"] = "tiny_kitti_revival"
    cfg_path = str(tmp_path / "config.yaml")
    yaml.safe_dump(base, open(cfg_path, "w"))

    stats = main(["--config", cfg_path, "--cpu", "--window", "2",
                  "--result-path", str(tmp_path / "results")])
    assert stats["n_programs"] == 1 and stats["n_dropped"] == 0
    # Oracle dets, contiguous tracks: revival must not change the perfect
    # recall/precision outcome.
    assert stats["metrics"].recall == 1.0


def test_ghost_coverage_streams_through_runner(kitti_tree, tmp_path):
    """assoc.ghost_coverage through the real windowed runner: ghost
    coverage rows (scored by the track's last det-head confidence) land in
    the KITTI result txts under their track's id, parse back cleanly, and
    score.  (The
    untrained debug net links nothing, so every track ghosts every frame
    — the QUALITY of coverage is measured by scripts/real_quality_run.py
    on a trained model; this test checks the plumbing.)"""
    import yaml

    from mmmot_tpu.cli.track import main
    from mmmot_tpu.data.kitti_io import read_kitti_tracking_labels

    base = yaml.safe_load(open("experiments/tiny_debug/config.yaml"))
    base["data"] = {"max_dets": 4, "crop_size": [32, 32], "point_len": 16,
                    "root": kitti_tree}
    base["assoc"] = {"solver": "auction", "revival_window": 2,
                     "ghost_coverage": True}
    base["name"] = "tiny_kitti_coverage"
    cfg_path = str(tmp_path / "config.yaml")
    yaml.safe_dump(base, open(cfg_path, "w"))

    stats = main(["--config", cfg_path, "--cpu", "--window", "2",
                  "--result-path", str(tmp_path / "results")])
    assert stats["n_dropped"] == 0
    assert stats["metrics"].recall == 1.0   # real dets still all tracked
    import glob
    txts = glob.glob(str(tmp_path / "results" / "**" / "0000.txt"),
                     recursive=True)
    assert txts, "result txt not written"
    frames = read_kitti_tracking_labels(txts[0])
    objs = [o for objs_f in frames.values() for o in objs_f]
    # Oracle det rows carry the detector's score 1.0; ghost-coverage rows
    # carry the track's last det-head confidence (a sigmoid in (0, 1)).
    ghosts = [o for o in objs if o.score < 1.0]
    assert ghosts, "no ghost coverage rows written"
    assert all(0.0 < g.score < 1.0 for g in ghosts), \
        "ghost rows must be scored by the carried det-head confidence"
    real_ids = {o.track_id for o in objs if o.score == 1.0}
    assert all(g.track_id in real_ids for g in ghosts), \
        "ghost rows must continue existing track ids"
    # Ghost rows carry finite boxes inside the frame.
    import numpy as np
    for g in ghosts:
        assert np.isfinite(np.asarray(g.bbox, float)).all()


def test_joint_multiclass_single_pass(kitti_tree, tmp_path):
    """track_class 'All' + assoc.class_gate: ONE tracking pass covers every
    class — per-class devkit/HOTA summaries come from the one result set,
    result rows carry each detection's own type, and every track id is
    class-pure (the gate forbids cross-class links)."""
    import yaml

    from mmmot_tpu.cli.track import main
    from mmmot_tpu.data.kitti_io import read_kitti_tracking_labels

    base = yaml.safe_load(open("experiments/tiny_debug/config.yaml"))
    base["data"] = {"max_dets": 4, "crop_size": [32, 32], "point_len": 16,
                    "root": kitti_tree, "track_class": "All"}
    base["assoc"] = {"solver": "auction", "class_gate": True}
    base["name"] = "tiny_kitti_joint"
    cfg_path = str(tmp_path / "config.yaml")
    yaml.safe_dump(base, open(cfg_path, "w"))

    stats = main(["--config", cfg_path, "--cpu", "--window", "2",
                  "--result-path", str(tmp_path / "results")])
    assert stats["n_dropped"] == 0
    assert "metrics_by_class" in stats and "hota_by_class" in stats
    res_dir = tmp_path / "results" / "tiny_kitti_joint" / "latest"
    for c in ("car", "pedestrian", "cyclist"):
        assert (res_dir / f"summary_{c}.txt").exists(), c
        assert stats["metrics_by_class"][c] is not None
    # Both classes tracked in the one pass, with their own types; recall
    # is 1.0 per class on oracle dets (every detection emitted).
    assert stats["metrics_by_class"]["car"].recall == 1.0
    assert stats["metrics_by_class"]["pedestrian"].recall == 1.0
    frames = read_kitti_tracking_labels(str(res_dir / "0000.txt"))
    objs = [o for objs_f in frames.values() for o in objs_f]
    types = {o.obj_type for o in objs}
    assert types == {"Car", "Pedestrian"}
    # Class purity: no track id spans two classes.
    id2types = {}
    for o in objs:
        id2types.setdefault(o.track_id, set()).add(o.obj_type)
    assert all(len(ts) == 1 for ts in id2types.values()), id2types


def test_class_gate_forbids_crossclass_links():
    """Identical appearance, different classes: the class gate must force a
    FRESH track instead of a cross-class link."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmmot_tpu.config import AssocConfig
    from mmmot_tpu.configs import tiny
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import TrackingModule, track_sequence

    cfg = tiny().model
    net = model_entry(cfg)
    T, Ns, P = 2, 4, 16
    batch = {"crops": jnp.zeros((1, 2, Ns, 32, 32, 3)),
             "points": jnp.zeros((1, 2, Ns, P, 4)),
             "point_mask": jnp.ones((1, 2, Ns, P), bool),
             "det_mask": jnp.ones((1, 2, Ns), bool)}
    vars_ = jax.jit(lambda r, b: net.init({"params": r}, b, train=False))(
        jax.random.PRNGKey(0), batch)
    sig = jax.random.normal(jax.random.PRNGKey(5), (32, 32, 3))
    sigp = jax.random.normal(jax.random.PRNGKey(5), (P, 4))
    crops = jnp.tile(sig[None, None], (T, Ns, 1, 1, 1))
    points = jnp.tile(sigp[None, None], (T, Ns, 1, 1))
    pm = jnp.ones((T, Ns, P), bool)
    dm = jnp.zeros((T, Ns), bool).at[:, 0].set(True)

    def run(cls_arr, gate):
        m = TrackingModule(net, vars_,
                           AssocConfig(solver="auction", class_gate=gate))
        return np.asarray(jax.jit(
            lambda c, p, q, d, k: track_sequence(m, c, p, q, d,
                                                 det_cls=k))(
            crops, points, pm, dm, jnp.asarray(cls_arr, jnp.int32))["ids"])

    same = np.zeros((T, Ns), np.int32)
    ids_same = run(same, True)
    assert ids_same[0, 0] == ids_same[1, 0], \
        "same class + identical appearance must link"
    diff = same.copy()
    diff[1, 0] = 1          # frame 1's det is a different class
    ids_diff = run(diff, True)
    assert ids_diff[0, 0] != ids_diff[1, 0], \
        "class gate must forbid the cross-class link"


def test_submission_zip_packaging(kitti_tree, tmp_path):
    """--submission-zip packages the tracked sequences' result txts (and
    only them: devkit side-products and sweep dirs are excluded) in the
    KITTI server layout — <seq>.txt at the archive root."""
    import zipfile

    import yaml

    from mmmot_tpu.cli.track import main
    from mmmot_tpu.data.kitti_io import package_submission

    base = yaml.safe_load(open("experiments/tiny_debug/config.yaml"))
    base["data"] = {"max_dets": 4, "crop_size": [32, 32], "point_len": 16,
                    "root": kitti_tree}
    base["name"] = "tiny_kitti_submit"
    cfg_path = str(tmp_path / "config.yaml")
    yaml.safe_dump(base, open(cfg_path, "w"))

    zip_path = str(tmp_path / "submit" / "tracking.zip")
    # --no-eval: the KITTI test split ships no GT, exactly this flow.
    main(["--config", cfg_path, "--cpu", "--window", "2", "--no-eval",
          "--result-path", str(tmp_path / "results"),
          "--submission-zip", zip_path])
    res_dir = tmp_path / "results" / "tiny_kitti_submit" / "latest"
    with zipfile.ZipFile(zip_path) as zf:
        assert sorted(zf.namelist()) == ["0000.txt", "0001.txt"]
        for name in zf.namelist():
            assert zf.read(name) == (res_dir / name).read_bytes()

    # Exclusion rules: devkit summaries / HOTA files / sweep dirs never
    # leak into a submission.
    (res_dir / "summary_car.txt").write_text("devkit summary\n")
    (res_dir / "hota_car.txt").write_text("hota\n")
    (res_dir / "thr_0.3").mkdir()
    (res_dir / "thr_0.3" / "0000.txt").write_text("sweep\n")
    names = package_submission(str(res_dir), str(tmp_path / "again.zip"))
    assert names == ["0000.txt", "0001.txt"]

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        package_submission(str(tmp_path), str(tmp_path / "empty.zip"))
