"""Model families.

The framework's model zoo mirrors the reference's (model.py + embedding.py):
tiny occupancy fields with icosahedral positional encoding, in three
configurations selected purely by config —

  * object field   (hidden 32,  scale 2,  the vMAP per-object model)
  * background     (hidden 128, scale 5+)
  * iMAP scene     (hidden 256, scale 5+, single field for the whole scene)

``OccupancyField`` bundles init/apply/eval for one field;
the stacked-bank training path uses the same underlying pure functions
(ops/embedding.py, ops/mlp.py) directly.
"""

from vmap_tpu.models.occupancy_field import OccupancyField  # noqa: F401
