"""Per-block window-tile statistics for the fused conv's DMA planning.

Decides whether tile-granular window DMA (copy only the 128-lane tiles a
block actually references, instead of one contiguous WINDOW) is worth the
kernel complexity at the ci<128 levels the compacted path does not cover
(BENCH.md round-3 roofline: the compacted conv supersedes tile-granular
DMA at ci>=128).

For each level's k3 book (and the k5 stem) at BLOCK in {256, 512}:
  span   = max(entry) - (min(entry) & ~127) + 1     (rows, per block)
  union  = #distinct 128-tiles referenced by the block (all offsets)
  window = what the current kernel DMAs (WINDOW tiles, 16 at W=2048)

Prints mean/p50/p90/p99/max of span and union, plus the DMA-byte ratios
  union/window  (tile-granular gain)  and  ceil(span/128)/window
  (per-block ragged-length gain — contiguous, much simpler kernel).

Runs fully on CPU (env JAX_PLATFORMS=cpu is honored by enable_compile_cache).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# hard override: this rig's session env force-sets JAX_PLATFORMS=axon, so
# setdefault would keep the (possibly dead) remote-TPU pin
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

from gcdlss_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from gcdlss_tpu.ops.plan import build_unet_plan
from gcdlss_tpu.train.common import default_caps

NSC = int(os.environ.get("NSC", "2"))
P = 80_000
VOXEL_SIZE = 0.05


def synth_scan_points(rng, n):
    beams = 64
    per_beam = n // beams
    elev = np.deg2rad(np.linspace(-24.0, 2.0, beams))
    az = rng.uniform(0, 2 * np.pi, (beams, per_beam))
    e = np.broadcast_to(elev[:, None], (beams, per_beam))
    h = 1.73
    rng_ground = np.where(np.sin(e) < -1e-3,
                          h / np.maximum(-np.sin(e), 1e-3), 80.0)
    wall_r = rng.uniform(4, 60, (beams, per_beam))
    hits_wall = rng.random((beams, per_beam)) < 0.35
    r = np.minimum(rng_ground, np.where(hits_wall, wall_r, np.inf))
    r = np.minimum(r, 80.0)
    x = (r * np.cos(e) * np.cos(az)).reshape(-1)
    y = (r * np.cos(e) * np.sin(az)).reshape(-1)
    z = (h + r * np.sin(e)).reshape(-1)
    return np.stack([x, y, z], 1)[:n]


def block_stats(nbr, block, n_src):
    nbr = np.asarray(nbr)
    n, k = nbr.shape
    nb = n // block
    nbr = nbr[: nb * block].reshape(nb, block, k)
    spans, unions = [], []
    for b in range(nb):
        e = nbr[b][nbr[b] >= 0]
        if e.size == 0:
            continue
        ws = min(int(e.min()) & ~127, max(n_src - 2048, 0))
        spans.append(int(e.max()) - ws + 1)
        unions.append(len(np.unique((e - ws) >> 7)))
    return np.array(spans), np.array(unions)


def pct(a, q):
    return int(np.percentile(a, q)) if a.size else 0


def main():
    rng = np.random.default_rng(0)
    pts = np.concatenate([synth_scan_points(rng, P) for _ in range(NSC)])
    bidx = np.repeat(np.arange(NSC), P)
    q = np.floor(pts / VOXEL_SIZE).astype(np.int32)
    cap0 = NSC * 69120
    vox, off = [], 0
    for b in range(NSC):
        qq = q[bidx == b]
        key = ((qq[:, 0].astype(np.int64) + 8192) << 28) | \
              ((qq[:, 1].astype(np.int64) + 8192) << 14) | \
              (qq[:, 2].astype(np.int64) + 8192)
        u, ui = np.unique(key, return_index=True)[:2]
        take = min(len(u), cap0 - off)
        vox.append(np.concatenate(
            [np.full((take, 1), b, np.int32), qq[np.sort(ui[:take])]], 1))
        off += take
    vc = np.concatenate(vox)
    m = len(vc)
    coords = np.zeros((cap0, 4), np.int32)
    coords[:m] = vc
    valid = np.zeros(cap0, bool)
    valid[:m] = True
    print(f"voxels: {m} of cap {cap0}", flush=True)

    caps = default_caps(cap0)
    plan = jax.jit(
        lambda c, v: build_unet_plan(c, v, tuple(caps)),
    )(jnp.asarray(coords), jnp.asarray(valid))
    plan = jax.tree.map(np.asarray, plan)

    books = [("stem_k5", plan.stem_nbr, caps[0])]
    for l, lvl in enumerate(plan.levels):
        books.append((f"L{l}_k3", lvl.nbr3, caps[l]))

    for name, nbr, cap in books:
        for block in (256, 512):
            spans, unions = block_stats(nbr, block, cap)
            if spans.size == 0:
                continue
            wt = 2048 // 128
            need = np.ceil(spans / 128).astype(int)
            print(
                f"{name:8s} B={block}: span p50/p90/p99/max = "
                f"{pct(spans,50)}/{pct(spans,90)}/{pct(spans,99)}/"
                f"{spans.max()}  union tiles p50/p90/p99/max = "
                f"{pct(unions,50)}/{pct(unions,90)}/{pct(unions,99)}/"
                f"{unions.max()}  "
                f"union/W16 = {unions.mean()/wt:.2f}  "
                f"span/W16 = {need.mean()/wt:.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
