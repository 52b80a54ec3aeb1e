"""Shared headless example runner (reference `ci.yml:101` — the reference
CI runs every example; this is the avian_tpu counterpart so examples
cannot rot).

Each example is executed as a fresh CPU subprocess with a scrubbed
environment (``PYTHONPATH=""`` drops the axon site hook; see
`tests/conftest.py` for why the TPU backend must never be touched from
the suite). Examples are self-asserting (they raise on failure), so a
zero exit code is the pass criterion.

The example list is split across three test modules
(`test_examples_{a,b,c}.py`) purely so pytest-xdist's ``--dist
loadfile`` spreads them over the 3 workers.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

EXAMPLES_DIR = Path(__file__).resolve().parent.parent / "examples"

# Per-example subprocess deadline. These are pure-CPU children (no TPU
# tunnel involvement), so timeout-killing them is safe.
DEADLINE_S = 420


def run_example(name: str) -> None:
    path = EXAMPLES_DIR / f"{name}.py"
    assert path.exists(), f"example missing: {path}"
    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # drop /root/.axon_site — never init the TPU tunnel
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("XLA_FLAGS", "")
    proc = subprocess.run(
        [sys.executable, str(path)],
        capture_output=True,
        text=True,
        timeout=DEADLINE_S,
        env=env,
        cwd=str(EXAMPLES_DIR.parent),
    )
    if proc.returncode != 0:
        raise AssertionError(
            f"example {name} failed (rc={proc.returncode})\n"
            f"--- stdout ---\n{proc.stdout[-3000:]}\n"
            f"--- stderr ---\n{proc.stderr[-3000:]}"
        )


def all_examples() -> list[str]:
    return sorted(p.stem for p in EXAMPLES_DIR.glob("*.py"))
