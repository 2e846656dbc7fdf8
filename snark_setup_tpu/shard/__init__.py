from .mesh import (
    make_mesh,
    sharded_batch_exp_fn,
    sharded_group_ifft_fn,
    sharded_msm_fn,
    sharded_step_fn,
)
from .runtime import active_mesh, mesh_size, pad_width, reset_mesh_cache

__all__ = [
    "make_mesh",
    "sharded_batch_exp_fn",
    "sharded_group_ifft_fn",
    "sharded_msm_fn",
    "sharded_step_fn",
    "active_mesh",
    "mesh_size",
    "pad_width",
    "reset_mesh_cache",
]
