"""gcdlss_tpu — TPU-native Generalized Class Discovery for LiDAR Semantic Segmentation.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Minseokkim-0124/Generalized-Class-Discovery-for-LiDAR-Semantic-Segmentation
(GCDLSS, WACV 2026): sparse-conv MinkUNet backbones over fixed-capacity padded
voxel buffers, Stage-1 supervised pretraining, and Stage-2 mean-teacher novel
class discovery with LaserMix, a Novel Candidate Classifier with learnable
threshold, online cosine k-means over-clustering, and Hungarian-aligned novel
heads — all designed TPU-first (static shapes, MXU-friendly gather-GEMM-scatter
sparse convolution, jit-compiled training steps, Mesh/pjit data parallelism).
"""

__version__ = "0.1.0"
