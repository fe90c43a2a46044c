"""Device-side LaserMix: pitch-band scan mixing inside the jitted step.

Rebuilds `laser_mix_transform` / `mix_transform`
(`modules/exp_merge_mean_teacher.py:1577-1787`) as masked fixed-shape ops:
each (labeled, unlabeled) scan pair is partitioned into `num_areas` pitch
bands between -25 and 3 degrees; even bands (counted from the top) of the
labeled scan and odd bands of the unlabeled scan form mix1, the complements
form mix2. Instead of ragged concatenation we keep the union point set
[2P] per mixed scan with membership masks, then re-voxelize on device
(the reference quantizes mixed clouds in-step too, `:2856-2861`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PITCH_ANGLES = (-25.0, 3.0)
NUM_AREAS_CHOICES = (3, 4, 5, 6)


def pitch_of(xyz: jax.Array) -> jax.Array:
    rho = jnp.sqrt(xyz[..., 0] ** 2 + xyz[..., 1] ** 2)
    return jnp.arctan2(xyz[..., 2], rho)


def band_parity(xyz: jax.Array, num_areas: jax.Array) -> jax.Array:
    """Band parity per point (0 = even band from the top)."""
    down = PITCH_ANGLES[0] / 180.0 * jnp.pi
    up = PITCH_ANGLES[1] / 180.0 * jnp.pi
    p = jnp.clip(pitch_of(xyz), down + 1e-5, up - 1e-5)
    na = num_areas.astype(jnp.float32)
    step = (up - down) / na
    band = jnp.clip(((up - p) / step).astype(jnp.int32), 0, num_areas - 1)
    return band % 2


def lasermix_pair(sup, unsup, num_areas):
    """Mix one labeled/unlabeled scan pair.

    sup/unsup: dicts with xyz [P,3], feats [P,C], labels [P], valid [P]
    (unsup labels are teacher pseudo-labels, -1 where unconfident).

    Returns dict with union arrays [2P]: xyz, feats, labels, and membership
    masks mix1 / mix2.
    """
    par_s = band_parity(sup["xyz"], num_areas)
    par_u = band_parity(unsup["xyz"], num_areas)
    in1_s = (par_s == 0) & sup["valid"]
    in1_u = (par_u == 1) & unsup["valid"]
    xyz = jnp.concatenate([sup["xyz"], unsup["xyz"]], axis=0)
    feats = jnp.concatenate([sup["feats"], unsup["feats"]], axis=0)
    labels = jnp.concatenate([sup["labels"], unsup["labels"]], axis=0)
    valid = jnp.concatenate([sup["valid"], unsup["valid"]], axis=0)
    mix1 = jnp.concatenate([in1_s, in1_u], axis=0)
    mix2 = valid & ~mix1
    return {"xyz": xyz, "feats": feats, "labels": labels, "mix1": mix1, "mix2": mix2}


def lasermix_voxel_groups(coords, is_sup, num_sup, num_areas, voxel_size):
    """Mixed-scan id per combined voxel row, from voxel-CENTER pitch parity.

    Voxel-level LaserMix: instead of mixing the raw point clouds and
    re-quantizing 2S*2P points in-step (the reference's
    `exp_merge_mean_teacher.py:2856-2861` protocol, kept as the
    `mix_plan_mode="point"` oracle), assign each voxel of the ALREADY
    BUILT combined plan to one mixed scan. Voxels are 0.05 m and pitch
    bands span degrees, so a voxel's points share a band except on the
    band-boundary shell; there the center parity decides (divergence:
    the point path may emit a straddling voxel into BOTH mixed scans,
    with the first in-band point as representative).

    coords: [cap0, 4] combined-plan level-0 (b,x,y,z); sup scans are
    b in [0, num_sup), unsup are [num_sup, 2*num_sup). Mixed scan g of
    pair i: g=i collects even sup bands + odd unsup bands (mix1), and
    g=num_sup+i the complements (mix2), matching `lasermix_batch`'s
    stacking order.
    """
    center = (coords[:, 1:4].astype(jnp.float32) + 0.5) * voxel_size
    par = band_parity(center, num_areas)
    b = coords[:, 0]
    pair = jnp.where(is_sup, b, b - num_sup)
    in1 = jnp.where(is_sup, par == 0, par == 1)
    return jnp.where(in1, pair, num_sup + pair).astype(jnp.int32)


def lasermix_batch(sup_points, unsup_points, pseudo_labels, num_areas):
    """Mix B/2 scan pairs into B mixed scans.

    sup_points / unsup_points: dicts of [S, P, *] arrays (S scans each).
    pseudo_labels: [S, P] teacher point pseudo-labels for the unsup scans.
    Returns (xyz [2S, 2P, 3], feats [2S, 2P, C], labels [2S, 2P], valid [2S, 2P]).
    """
    s = sup_points["xyz"].shape[0]

    def one(i):
        sup = {
            "xyz": sup_points["xyz"][i],
            "feats": sup_points["feats"][i],
            "labels": sup_points["mapped_labels"][i],
            "valid": sup_points["valid"][i],
        }
        unsup = {
            "xyz": unsup_points["xyz"][i],
            "feats": unsup_points["feats"][i],
            "labels": pseudo_labels[i],
            "valid": unsup_points["valid"][i],
        }
        return lasermix_pair(sup, unsup, num_areas)

    mixed = [one(i) for i in range(s)]
    xyz = jnp.stack([m["xyz"] for m in mixed] * 2)
    feats = jnp.stack([m["feats"] for m in mixed] * 2)
    labels = jnp.stack([m["labels"] for m in mixed] * 2)
    valid = jnp.stack([m["mix1"] for m in mixed] + [m["mix2"] for m in mixed])
    return xyz, feats, labels, valid
