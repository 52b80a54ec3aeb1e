"""Headless run of every example, tranche d (see
`tests/example_runner.py`). Reference counterpart: the reference CI runs
all examples (`ci.yml:101`). Also holds the completeness guard: every
file in `examples/` must be claimed by exactly one tranche."""

import pytest

from example_runner import all_examples, run_example

EXAMPLES = [
    'batched_rollout_2d', 'chain_2d', 'convex_decomposition_3d',
    'custom_collider', 'distance_joint_2d',
    'dynamic_character_2d', 'dynamic_character_3d', 'fixed_joint_2d',
    'kinematic_character_2d', 'many_pyramids_2d', 'native_2d_showcase',
    'prismatic_joint_2d', 'revolute_joint_2d',
]


@pytest.mark.parametrize("name", EXAMPLES)
def test_example(name):
    run_example(name)


def test_every_example_is_registered():
    import test_examples_a, test_examples_b, test_examples_c

    claimed = (
        list(test_examples_a.EXAMPLES) + list(test_examples_b.EXAMPLES)
        + list(test_examples_c.EXAMPLES) + list(EXAMPLES)
    )
    assert sorted(claimed) == all_examples(), (
        sorted(set(all_examples()) ^ set(claimed))
    )
    assert len(claimed) == len(set(claimed))
