"""Headless run of every example, tranche b (see
`tests/example_runner.py`). Reference counterpart: the reference CI runs
all examples (`ci.yml:101`)."""

import pytest

from example_runner import run_example

EXAMPLES = ['custom_constraint', 'debugdump_3d', 'determinism_2d', 'diagnostics_demo', 'distance_joint_3d', 'dominance', 'fixed_joint_3d', 'gyroscopic_motion', 'interpolation_demo', 'joints_tour', 'kinematic_character_3d', 'kinematic_platform', 'many_shapes']


@pytest.mark.parametrize("name", EXAMPLES)
def test_example(name):
    run_example(name)
