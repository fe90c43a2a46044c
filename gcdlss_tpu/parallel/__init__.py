from .mesh import make_mesh, replicate, shard_voxel_batch, shard_point_batch
