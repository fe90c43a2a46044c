"""Host data-loader throughput at real-KITTI rates (VERDICT r2 weak #9).

The device step consumes 4 scans x 80k points per Stage-2 iteration; at the
north-star 50 scans/s/chip the loader must read + augment + quantize 50
scans/s on the host. This bench writes KITTI-sized synthetic scans (80k pts)
to disk, then measures `PrefetchLoader` end-to-end (read -> augment ->
C++/numpy quantize -> fixed-capacity collate) across worker counts.

    python tools/loader_bench.py [--scans 48] [--points 80000]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/loader_bench_kitti")
    ap.add_argument("--scans", type=int, default=48)
    ap.add_argument("--points", type=int, default=80_000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--voxel-cap", type=int, default=276_480)
    ap.add_argument("--voxel-size", type=float, default=0.05)
    a = ap.parse_args()

    from gcdlss_tpu.data import write_synthetic_kitti, SemanticKITTIDataset
    from gcdlss_tpu.data.loader import PrefetchLoader
    from gcdlss_tpu.data.quantize_np import _get_native

    marker = os.path.join(a.root, f".done{a.scans}_{a.points}")
    if not os.path.exists(marker):
        write_synthetic_kitti(a.root, sequences=("00",), scans_per_seq=a.scans,
                              num_points=a.points, seed=1)
        open(marker, "w").close()
    print(f"native quantizer: {bool(_get_native())}", flush=True)

    ds = SemanticKITTIDataset(
        a.root, "train", voxel_size=a.voxel_size, downsampling=a.points,
        augment=True, seed=0,
    )
    # per-sample cost (single-threaded floor)
    t0 = time.perf_counter()
    for i in range(8):
        ds[i % len(ds)]
    per = (time.perf_counter() - t0) / 8
    print(f"single-thread __getitem__: {per * 1e3:.1f} ms/scan "
          f"({1 / per:.1f} scans/s)", flush=True)

    from gcdlss_tpu.data.loader import MultiprocessLoader

    for backend, cls in (("thread", PrefetchLoader),
                         ("process", MultiprocessLoader)):
        for nw in (1, 2, 4, 8):
            lo = cls(ds, a.batch, a.voxel_cap // a.batch,
                     point_cap=a.points, num_workers=nw, seed=1)
            n = 0
            t0 = time.perf_counter()
            for batch in lo:
                n += a.batch
            dt = time.perf_counter() - t0
            print(f"{backend} workers={nw}: {n / dt:.1f} scans/s "
                  f"({dt / (n / a.batch) * 1e3:.0f} ms/batch)", flush=True)


if __name__ == "__main__":
    main()
