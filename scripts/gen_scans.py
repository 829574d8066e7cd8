"""Pre-generate the per-frame raycast scan cache (utils/drives.scan_stream)
for a set of drive configs, in parallel worker processes. Raycasting costs
~5 s/frame on this host; caching decouples solver iteration (~ms/frame
replay) from world synthesis.

Usage:
  python scripts/gen_scans.py --frames 120 --workers 2 \
      --drives a:104,a:205,a:306 [--rings 64 --az 1870]
Drive spec route:world_seed expands to the sweep convention
(cars=world+8, occ=world+9, i.e. world=3+101s, cars=11+101s, occ=12+101s).
"""
from __future__ import annotations

import argparse
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(spec):
    route, world, frames, rings, az, offset, stride = spec
    from tloam_tpu.utils import drives

    n = 0
    t0 = time.time()
    for i, xyz, _ in drives.scan_stream(
        frames, route=route, world_seed=world, cars_seed=world + 8,
        occ_seed=world + 9, rings=rings, az=az, cache=True,
        frame_offset=offset, frame_stride=stride,
    ):
        n += 1
        if n % 20 == 0:
            print(
                f"[{route}/w{world}+{offset}] {n} frames, "
                f"{(time.time() - t0) / n:.2f} s/frame",
                flush=True,
            )
    return (route, world, offset, n, time.time() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--drives", required=True,
                    help="comma list of route:world_seed")
    ap.add_argument("--rings", type=int, default=64)
    ap.add_argument("--az", type=int, default=1870)
    args = ap.parse_args()

    specs = []
    drive_list = []
    for item in args.drives.split(","):
        route, world = item.split(":")
        drive_list.append((route, int(world)))
    if len(drive_list) >= args.workers:
        # one worker per drive, drives queued
        for route, world in drive_list:
            specs.append((route, world, args.frames, args.rings, args.az, 0, 1))
    else:
        # split each drive across workers by frame stride
        per = max(1, args.workers // len(drive_list))
        for route, world in drive_list:
            for off in range(per):
                specs.append(
                    (route, world, args.frames, args.rings, args.az, off, per)
                )

    t0 = time.time()
    with mp.Pool(args.workers) as pool:
        for res in pool.imap_unordered(worker, specs):
            print("done:", res, flush=True)
    print(f"total {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
