from .mesh import make_mesh, sharded_batch_exp_fn, sharded_msm_fn

__all__ = ["make_mesh", "sharded_batch_exp_fn", "sharded_msm_fn"]
