from .kmeans import cosine_kmeans, euclidean_kmeans
from .hungarian_jax import hungarian_small
from .queue import FeatureQueue, queue_init, queue_push, queue_flatten
from .sinkhorn import (
    sinkhorn_knopp,
    sinkhorn_knopp_weighted,
    semi_sinkhorn_knopp,
    balanced_sinkhorn,
)
