"""Docs examples must actually run (CPU): the analogue of the reference's
executed-notebook docs (reference docs/examples/*.ipynb run at doc build)."""
import os
import runpy

import pytest

EXAMPLES = [
    "example_filter_types.py",
    "example_tripole_grid.py",
    "example_satellite_observations.py",
    "example_viscosity_filter.py",
    "example_sharded_filtering.py",
    "example_tpu_filtering.py",
]

EX_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name):
    path = os.path.join(EX_DIR, name)
    assert os.path.exists(path), f"example missing: {name}"
    runpy.run_path(path, run_name="__main__")
