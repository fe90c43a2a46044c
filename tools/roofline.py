"""Speed-of-light analysis of the Stage-2 bench workload (pure numpy).

Builds the bench's exact voxel population (4 x 80k-pt synthetic scans,
voxel 0.05), derives every UNet level's voxel count and rulebook fill,
enumerates MinkUNet34's conv list, and prices each conv two ways:

  * MXU FLOPs — dense-dot (what the fused kernel executes: the [K*Ci, B]
    x [K*Ci, Co] block dot includes absent-offset zero rows) and
    fill-only (the lower bound a fill-aware kernel could reach);
  * HBM bytes — window DMA (nb * cpad/2 * W * 4, the dominant term at
    WINDOW/BLOCK = 8x read amplification), output writes, weights.

Then composes the Stage-2 step (teacher fwd + 2x student fwd/bwd at
combined + mixed shapes) and prints roofline milliseconds against v5e
peaks (bf16 MXU ~197 TFLOP/s, HBM ~819 GB/s) next to the measured phase
times (BENCH.md mega7 profile). Estimates only — the point is the ratio.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

MXU = 197e12  # v5e bf16 FLOP/s
HBM = 819e9  # v5e bytes/s
BLOCK, WINDOW = 256, 2048
K8 = {27: 32, 125: 128, 8: 8}


def cpad(ci):
    return max(32, -(-ci // 32) * 32)


def key_of(c):
    off = 1 << 20
    return (((c[:, 0].astype(np.int64) + off) << 42)
            | ((c[:, 1].astype(np.int64) + off) << 21)
            | (c[:, 2].astype(np.int64) + off))


def fill_count(coords, k):
    """Total present (row, offset) pairs for a k^3 kernel at this level."""
    keys = np.sort(key_of(coords))
    r = k // 2
    total = 0
    off = 1 << 20  # must match key_of's packing offset
    for dx in range(-r, r + 1):
        for dy in range(-r, r + 1):
            # z-contiguity: one searchsorted pair per (dx, dy) column
            base = keys + (dx << 42) + (dy << 21)
            lo = np.searchsorted(keys, base - r)
            hi = np.searchsorted(keys, base + r + 1)
            total += int(np.sum(hi - lo))
    return total


def main():
    import importlib.util as ilu
    spec = ilu.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)

    rng = np.random.default_rng(0)
    scans = [bench.synth_scan_points(rng, 80000) for _ in range(4)]
    qs = [np.unique(np.floor(p / 0.05).astype(np.int32), axis=0)
          for p in scans]
    levels = []  # [per-level list of per-scan coord arrays]
    cur = qs
    for _ in range(5):
        levels.append(cur)
        cur = [np.unique(c >> 1, axis=0) for c in cur]

    n_lvl = [sum(len(c) for c in cs) for cs in levels]
    print("level voxels:", n_lvl, flush=True)
    fill3 = [sum(fill_count(c, 3) for c in cs) for cs in levels]
    fill5 = [sum(fill_count(c, 5) for c in cs) for cs in levels[:1]]
    print("k3 fill/voxel:", [round(f / n, 2) for f, n in zip(fill3, n_lvl)],
          "k5 stem:", round(fill5[0] / n_lvl[0], 2), flush=True)

    # ---- MinkUNet34 conv list: (level, kvol, ci, co, fill_pairs) ----
    P = (32, 64, 128, 256, 256, 128, 96, 96)
    L = (2, 3, 4, 6, 2, 2, 2, 2)
    convs = [(0, 125, 1, 32, fill5[0])]
    enc_in = 32
    for i in range(4):
        lvl = i + 1
        convs.append((lvl, 8, enc_in, enc_in, n_lvl[lvl - 1]))  # down k2
        ci = enc_in
        for b in range(L[i]):
            convs.append((lvl, 27, ci, P[i], fill3[lvl]))
            convs.append((lvl, 27, P[i], P[i], fill3[lvl]))
            if ci != P[i]:
                convs.append((lvl, 1, ci, P[i], n_lvl[lvl]))  # 1x1 proj
            ci = P[i]
        enc_in = P[i]
    x_ch = enc_in
    skips = [32, 64, 128, 256]
    for j in range(4):
        lvl = 3 - j
        convs.append((lvl, 8, x_ch, P[4 + j], n_lvl[lvl]))  # up k2
        ci = P[4 + j] + skips[lvl]
        for b in range(L[4 + j]):
            convs.append((lvl, 27, ci, P[4 + j], fill3[lvl]))
            convs.append((lvl, 27, P[4 + j], P[4 + j], fill3[lvl]))
            if ci != P[4 + j]:
                convs.append((lvl, 1, ci, P[4 + j], n_lvl[lvl]))
            ci = P[4 + j]
        x_ch = P[4 + j]

    dense = fillonly = dma = outw = wts = 0.0
    for lvl, kvol, ci, co, fill in convs:
        n = n_lvl[lvl]
        k8 = K8.get(kvol, kvol)
        cp = cpad(ci)
        if kvol >= 8:
            dense += 2.0 * n * k8 * cp * co
            nb = -(-n // BLOCK)
            dma += nb * (cp // 2) * WINDOW * 4
        else:
            dense += 2.0 * n * ci * co
            dma += n * cp * 2
        fillonly += 2.0 * fill * ci * co
        outw += n * co * 4
        wts += kvol * ci * co * 2
    print(f"one fwd: dense {dense/1e9:.1f} GFLOP ({dense/MXU*1e3:.2f} ms) | "
          f"fill-only {fillonly/1e9:.1f} GFLOP ({fillonly/MXU*1e3:.2f} ms)",
          flush=True)
    print(f"one fwd HBM: window DMA {dma/1e6:.0f} MB ({dma/HBM*1e3:.2f} ms) "
          f"+ out {outw/1e6:.0f} MB ({outw/HBM*1e3:.2f} ms)", flush=True)

    fwd_ms = max(dense / MXU, (dma + outw) / HBM) * 1e3
    # bwd = dX pass (same gather structure over go) + dW accumulation
    # (xT re-read); price as 2x fwd DMA + 2x dense FLOPs
    bwd_ms = max(2 * dense / MXU, 2 * (dma + outw) / HBM) * 1e3
    # step: teacher fwd + student fwd+bwd on combined + student fwd+bwd on
    # mixed (same size) — plan/mining/EMA excluded
    step = fwd_ms + 2 * (fwd_ms + bwd_ms)
    print(f"roofline: fwd {fwd_ms:.1f} ms, fwd+bwd {fwd_ms+bwd_ms:.1f} ms, "
          f"Stage-2 backbone work {step:.1f} ms "
          f"(measured: teacher 120.7, student 560.6 — BENCH.md mega7)",
          flush=True)
    print(f"window-DMA read amplification: {WINDOW/BLOCK:.0f}x "
          f"(W={WINDOW}, B={BLOCK})", flush=True)


if __name__ == "__main__":
    main()
