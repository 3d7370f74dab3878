"""Layer 1d: body physics (reference: all-is-cubes/src/physics)."""

from .body import Body, step_bodies

__all__ = ["Body", "step_bodies"]
