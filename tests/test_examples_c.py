"""Headless run of every example, tranche c (see
`tests/example_runner.py`). Reference counterpart: the reference CI runs
all examples (`ci.yml:101`)."""

import pytest

from example_runner import run_example

EXAMPLES = ['move_and_slide_2d', 'move_and_slide_3d', 'move_marbles', 'one_way_platform', 'picking_demo', 'prismatic_joint_3d', 'pyramid_2d', 'ray_caster', 'ray_sensors', 'revolute_joint_3d', 'sensor', 'trimesh_shapes_3d', 'tumbler', 'voxels_3d']


@pytest.mark.parametrize("name", EXAMPLES)
def test_example(name):
    run_example(name)
