from .mesh import (
    grid_mesh,
    state_sharding,
    distribute,
    mesh_shape_for,
)

__all__ = [
    "grid_mesh",
    "state_sharding",
    "distribute",
    "mesh_shape_for",
]
