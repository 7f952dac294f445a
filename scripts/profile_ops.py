"""Summarize a JAX xplane profile into a per-op-family time table.

Usage:
    MMMOT_BENCH_PROFILE=/tmp/prof python bench.py     # capture
    python scripts/profile_ops.py /tmp/prof           # summarize
    python scripts/profile_ops.py /tmp/prof --top 30 --fusions

Reads the newest ``*.xplane.pb`` under the given directory and prints,
per TPU plane line (the ``XLA Ops`` line is the device's op timeline):

* total device time,
* time per op family (fusion / while / sort / copy ...), and
* with ``--fusions``, the top individual fusions with operand shapes —
  the fastest way to see whether time is going to the conv stack
  (expected: ~98% of bf16 peak on the deep stages, docs/PERFORMANCE.md)
  or leaking into preprocessing/bookkeeping.

Caveats: ``while`` op durations include their body's fusions (nested
double-count — read the loop and its fusions together), and async
``copy-start`` durations overlap compute (long spans there are NOT
stalls; the blocking wait shows up in ``copy-done``).
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys


def load_xspace(profile_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(profile_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        sys.exit(f"no *.xplane.pb under {profile_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as fh:
        xs.ParseFromString(fh.read())
    return xs, paths[-1]


def summarize(xs, top: int, show_fusions: bool) -> None:
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            fam_ps = collections.Counter()
            fam_n = collections.Counter()
            fus_ps = collections.Counter()
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                head = name.split(" = ")[0]
                family = head.split(".")[0].lstrip("%")
                fam_ps[family] += ev.duration_ps
                fam_n[family] += 1
                if "fusion" in family:
                    fus_ps[name[:140]] += ev.duration_ps
            total = sum(fam_ps.values())
            print(f"[{plane.name}] device op time: {total / 1e9:.1f} ms")
            for fam, ps in fam_ps.most_common(top):
                print(f"  {ps / 1e9:9.2f} ms  x{fam_n[fam]:5d}  {fam}")
            if show_fusions:
                print("  -- top fusions --")
                for name, ps in fus_ps.most_common(top):
                    print(f"  {ps / 1e9:9.2f} ms  {name}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("profile_dir")
    p.add_argument("--top", type=int, default=15)
    p.add_argument("--fusions", action="store_true",
                   help="also list top individual fusions with shapes")
    args = p.parse_args(argv)
    xs, path = load_xspace(args.profile_dir)
    print(f"profile: {path}")
    summarize(xs, args.top, args.fusions)


if __name__ == "__main__":
    main()
