"""Headless run of every example, tranche a (see
`tests/example_runner.py`). Reference counterpart: the reference CI runs
all examples (`ci.yml:101`)."""

import pytest

from example_runner import run_example

EXAMPLES = ['batched_rollout', 'bouncing_ball', 'cast_ray_predicate', 'ccd', 'chain_3d', 'character_walk', 'collider_constructors', 'collision_layers', 'compound_colliders', 'conveyor_belt', 'cubes', 'custom_broad_phase', 'debugdump_2d']


@pytest.mark.parametrize("name", EXAMPLES)
def test_example(name):
    run_example(name)
