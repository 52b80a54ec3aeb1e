"""Golden-trajectory determinism (``determinism_2d.rs:8-12`` counterpart).

Asserts the committed CPU recordings reproduce bit-exactly (hash match) and
within 1e-3 positionally — the permanent trap for formula drift that
behavioral invariant tests can't catch (VERDICT round-2 item 2).
"""

import hashlib
import os

import numpy as np
import pytest

import golden_common as gc


@pytest.mark.parametrize("name", ["falling_hinges", "stack3"])
def test_golden_trajectory(name):
    path = os.path.join(gc.GOLDEN_DIR, f"{name}.npz")
    assert os.path.exists(path), (
        f"golden artifact missing; run `python tests/golden_common.py record`"
    )
    golden = np.load(path)
    world, config = gc.scenes()[name]
    pos, quat, digest = gc.run_trajectory(world, config)

    # Drift bound first (diagnosable failure before the strict hash).
    drift = np.abs(pos - golden["pos"]).max()
    qdrift = np.abs(quat - golden["quat"]).max()
    assert drift < 1e-3, f"{name}: positional drift {drift} vs golden"
    assert qdrift < 1e-3, f"{name}: rotational drift {qdrift} vs golden"

    # CPU must reproduce the recording bit-exactly (cross-run + cross-build
    # determinism hash, the reference's golden-hash bar).
    golden_digest = bytes(golden["sha256"]).hex()
    assert digest == golden_digest, (
        f"{name}: trajectory hash changed ({digest} != {golden_digest}). "
        "If the dynamics change is intentional, regenerate via "
        "`env PYTHONPATH= JAX_PLATFORMS=cpu python tests/golden_common.py "
        "record` and justify in the commit message."
    )


def test_golden_trajectory_2d_native():
    """Golden hash on the dedicated 2D engine (pyramid, 21 boxes)."""
    name = "pyramid2d_native"
    path = os.path.join(gc.GOLDEN_DIR, f"{name}.npz")
    assert os.path.exists(path), (
        "golden artifact missing; run `python tests/golden_common.py record`"
    )
    golden = np.load(path)
    world, config = gc.scenes_2d()[name]
    pos, angle, digest = gc.run_trajectory_2d(world, config)

    drift = np.abs(pos - golden["pos"]).max()
    adrift = np.abs(angle - golden["angle"]).max()
    assert drift < 1e-3, f"{name}: positional drift {drift} vs golden"
    assert adrift < 1e-3, f"{name}: angular drift {adrift} vs golden"

    golden_digest = bytes(golden["sha256"]).hex()
    assert digest == golden_digest, (
        f"{name}: trajectory hash changed ({digest} != {golden_digest})."
    )
