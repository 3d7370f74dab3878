"""aic_tpu — a TPU-native recursive-voxel simulation & rendering engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``kpreid/all-is-cubes`` (reference mounted at /root/reference): Spaces are
dense voxel arrays resident in TPU HBM, Blocks are palette entries whose
recursive voxel definitions are evaluated host-side into device tables,
rendering is a per-pixel two-level DDA raymarch kernel, global illumination
is a batched per-ray relaxation kernel, and physics is a vmapped body update.

Layering mirrors the reference's strict bottom-up dependency discipline
(reference ``doc/design-principles.md``):

- :mod:`aic_tpu.math`     — layer 0 substrate (faces, color, light packing, grids)
- :mod:`aic_tpu.block`    — block model + host-side evaluation
- :mod:`aic_tpu.space`    — device-resident Space state, palette, transactions
- :mod:`aic_tpu.light`    — light chart + batched GI relaxation
- :mod:`aic_tpu.raytrace` — camera + raytrace kernels (JAX + Pallas)
- :mod:`aic_tpu.physics`  — body/collision stepping
- :mod:`aic_tpu.mesh`     — face-culling mesher for export/GPU-style rendering
- :mod:`aic_tpu.universe` — Universe container, behaviors, step loop
- :mod:`aic_tpu.content`  — procedural templates (cornell box, demo city, ...)
- :mod:`aic_tpu.io`       — save/load and import/export
- :mod:`aic_tpu.parallel` — multi-chip sharding (mesh, tiled trace, slab light)
"""

__version__ = "0.1.0"
