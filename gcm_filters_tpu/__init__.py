"""gcm_filters_tpu: TPU-native diffusion-based spatial filtering for GCM data.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ocean-eddy-cpt/gcm-filters (reference: /root/reference/gcm_filters/__init__.py:1-15).

Public API mirrors the reference surface:
  - ``Filter``            — the user-facing filter class
  - ``FilterShape``       — GAUSSIAN | TAPER target shapes
  - ``GridType``          — the 11 supported grid discretizations
  - ``required_grid_vars``— grid-variable introspection per grid type

TPU-native extensions:
  - TPU knobs on ``Filter`` itself: compute ``dtype``, ``use_pallas``,
    ``mesh``/``spatial_axes``/``batch_axis`` sharding, ``exact_nan``
  - ``gcm_filters_tpu.parallel`` — 2D shard_map domain decomposition with
    halo exchange (incl. the tripolar north fold) over a ``jax.sharding.Mesh``
"""

from .models.grids import GridType, required_grid_vars
from .filter_spec import FilterShape, FilterSpec, filter_params
from .filter import Filter
from .ops.custom import BaseScalarOperator, BaseVectorOperator

__version__ = "0.1.0"

__all__ = [
    "Filter",
    "BaseScalarOperator",
    "BaseVectorOperator",
    "FilterShape",
    "FilterSpec",
    "GridType",
    "required_grid_vars",
    "filter_params",
    "__version__",
]
