from africanus_tpu.parallel.mesh import (
    make_mesh,
    row_sharding,
    replicated,
    shard_rows,
    pad_rows,
)
from africanus_tpu.parallel.predict import (
    sharded_im_to_vis,
    sharded_vis_to_im,
    sharded_rime_predict,
)

__all__ = [
    "make_mesh",
    "row_sharding",
    "replicated",
    "shard_rows",
    "pad_rows",
    "sharded_im_to_vis",
    "sharded_vis_to_im",
    "sharded_rime_predict",
]
