from .context import current_mesh, mesh_context
from .mesh import make_mesh
from .ntt import ntt_sharded
from .msm import msm_many_sharded, msm_sharded

__all__ = [
    "current_mesh", "make_mesh", "mesh_context",
    "msm_many_sharded", "msm_sharded", "ntt_sharded",
]
