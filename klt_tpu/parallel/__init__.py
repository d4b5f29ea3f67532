from .mesh import make_mesh, default_device_count
from .batch import make_pair_step, make_batch_step, track_batch

__all__ = ["make_mesh", "default_device_count", "make_pair_step",
           "make_batch_step", "track_batch"]
