"""Standalone contact_query surface (the reference's
``parry/contact_query.rs`` functions)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from avian_tpu import ShapeType
from avian_tpu.geometry import contact_query as cq

PAIRS = ((0, 0), (0, 2))
I = jnp.asarray([0.0, 0.0, 0.0, 1.0])


def _prm(*vals):
    return jnp.zeros(8).at[: len(vals)].set(jnp.asarray(vals, jnp.float32))


def test_distance_and_intersection():
    args = (
        jnp.asarray(0), jnp.asarray([0.0, 0.0, 0.0]), I, _prm(0.5),
        jnp.asarray(0), jnp.asarray([2.0, 0.0, 0.0]), I, _prm(0.5),
    )
    d = jax.jit(functools.partial(cq.distance, shape_pairs=PAIRS))(*args)
    assert abs(float(d) - 1.0) < 1e-5
    hit = jax.jit(
        functools.partial(cq.intersection_test, shape_pairs=PAIRS)
    )(*args)
    assert not bool(hit)

    args2 = args[:5] + (jnp.asarray([0.8, 0.0, 0.0]),) + args[6:]
    assert bool(
        jax.jit(
            functools.partial(cq.intersection_test, shape_pairs=PAIRS)
        )(*args2)
    )
    found, pa, pb, n, pen = jax.jit(
        functools.partial(cq.contact, shape_pairs=PAIRS)
    )(*args2)
    assert bool(found) and abs(float(pen) - 0.2) < 1e-5


def test_time_of_impact():
    hit, t = jax.jit(
        functools.partial(cq.time_of_impact, max_t=1.0, shape_pairs=PAIRS)
    )(
        jnp.asarray(0), jnp.asarray([0.0, 0.0, 0.0]), I, _prm(0.5),
        jnp.asarray([10.0, 0.0, 0.0]),
        jnp.asarray(0), jnp.asarray([5.0, 0.0, 0.0]), I, _prm(0.5),
        jnp.asarray([0.0, 0.0, 0.0]),
    )
    # Spheres of radius 0.5 at distance 5, closing at 10 m/s: touch after
    # travelling 4 -> t = 0.4.
    assert bool(hit)
    assert abs(float(t) - 0.4) < 5e-3
