from .mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    pipeline,
    sharded_pipeline,
    spatial_gaussian_blur,
)
