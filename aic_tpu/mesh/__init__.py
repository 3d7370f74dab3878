"""Layer 2b: meshing (reference: all-is-cubes-mesh)."""

from .mesher import SpaceMesh, mesh_space, visible_faces

__all__ = ["SpaceMesh", "mesh_space", "visible_faces"]
