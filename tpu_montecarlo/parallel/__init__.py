"""Multi-chip parallelism: mesh construction and sharded execution."""

from .mesh import default_mesh, mesh_info

__all__ = ["default_mesh", "mesh_info"]
