from .mesh import make_mesh
from .ntt import ntt_sharded
from .msm import msm_sharded

__all__ = ["make_mesh", "ntt_sharded", "msm_sharded"]
