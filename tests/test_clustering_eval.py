import numpy as np

from gcdlss_tpu.eval.clustering_eval import clustering_discovery_eval


def test_clustering_discovery_eval_separable():
    rng = np.random.default_rng(0)
    # 3 known classes (compressed 0..2) + 2 unknown clusters at slot 3
    centers = np.eye(5, 8) * 6
    n_per = 60
    feats, mapped, real = [], [], []
    # known: compressed id == real train id here for simplicity
    for c in range(3):
        feats.append(centers[c] + rng.normal(0, 0.2, (n_per, 8)))
        mapped.append(np.full(n_per, c))
        real.append(np.full(n_per, c))
    # unknowns: mapped to the unknown slot (3), real ids 3 and 4
    for j, rid in enumerate((3, 4)):
        feats.append(centers[3 + j] + rng.normal(0, 0.2, (n_per, 8)))
        mapped.append(np.full(n_per, 3))
        real.append(np.full(n_per, rid))
    feats = np.concatenate(feats).astype(np.float32)
    mapped = np.concatenate(mapped).astype(np.int32)
    real = np.concatenate(real).astype(np.int32)

    res = clustering_discovery_eval(
        feats, mapped, real,
        unknown_label=3,
        known_real_labels=[0, 1, 2],
        unknown_real_labels=[3, 4],
        num_classes=5,
        label_mapping_inv={0: 0, 1: 1, 2: 2},
        method="semi_kmeans",
    )
    assert res["mIoU_old"] > 0.99  # knowns are exact by construction
    assert res["mIoU_new"] > 0.9  # well-separated novel clusters recovered
