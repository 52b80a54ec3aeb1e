"""Checkpoint / resume: the whole simulation state is one pytree.

Counterpart of the reference's ``serialize`` feature (serde on all simulation
state incl. contact manifolds and warm-start impulses, SURVEY.md §5). The
warm-start impulse caches live in ``World.contacts`` and round-trip through
these helpers, so a restored simulation continues bit-identically.

Two backends: plain ``np.savez`` (zero deps) and orbax (for sharded
multi-host checkpoints of batched worlds).
"""

import dataclasses

import jax
import numpy as np

from avian_tpu.core.state import Bodies, Colliders, Contacts, Joints, World


def _flatten_with_paths(world: World):
    leaves = {}

    def walk(obj, prefix):
        if dataclasses.is_dataclass(obj):
            for f in dataclasses.fields(obj):
                walk(getattr(obj, f.name), f"{prefix}{f.name}.")
        elif prefix == "shape_pairs.":
            # Static metadata: encode as [P, 2] ints (empty = None).
            leaves["shape_pairs"] = np.asarray(
                [] if obj is None else [list(p) for p in obj], np.int32
            ).reshape(-1, 2)
        elif prefix == "custom_shapes.":
            # User support FUNCTIONS don't serialize; re-attach after
            # restore: world.replace(custom_shapes=(...,)).
            pass
        else:
            leaves[prefix[:-1]] = np.asarray(obj)

    walk(world, "")
    return leaves


def save(path: str, world: World) -> None:
    """Save a World (or batched World) to an .npz file."""
    np.savez_compressed(path, **_flatten_with_paths(world))


def load(path: str) -> World:
    """Load a World saved by :func:`save`."""
    data = np.load(path)

    def build(cls, prefix):
        kw = {}
        for f in dataclasses.fields(cls):
            key = f"{prefix}{f.name}"
            sub = {
                "bodies": Bodies,
                "colliders": Colliders,
                "contacts": Contacts,
                "joints": Joints,
            }.get(f.name)
            if sub is not None and cls is World:
                kw[f.name] = build(sub, key + ".")
            elif f.name == "shape_pairs":
                arr = data[key] if key in getattr(data, "files", ()) else None
                kw[f.name] = (
                    tuple(tuple(int(x) for x in row) for row in arr)
                    if arr is not None and arr.size
                    else None
                )
            elif f.name == "custom_shapes":
                kw[f.name] = ()  # not serializable; re-attach after restore
            elif f.name == "diverged" and key not in data.files:
                kw[f.name] = jax.numpy.zeros((), bool)  # older checkpoints
            elif f.name == "convex_verts" and key not in data.files:
                kw[f.name] = jax.numpy.zeros((1, 3), jax.numpy.float32)
            elif f.name in ("sleep_pos", "sleep_quat") and key not in data.files:
                # Older checkpoints: snapshot = live pose, so restored
                # sleeping bodies don't read as user-teleported.
                src = "pos" if f.name == "sleep_pos" else "quat"
                kw[f.name] = jax.numpy.asarray(data[f"{prefix}{src}"])
            else:
                kw[f.name] = jax.numpy.asarray(data[key])
        return cls(**kw)

    return build(World, "")


def load_2d(path: str):
    """Load a :class:`~avian_tpu.dim2.state.World2D` saved by :func:`save`
    (``save`` walks any dataclass pytree, so it covers both profiles)."""
    from avian_tpu.dim2.state import (
        Bodies2D,
        Colliders2D,
        Contacts2D,
        Joints2D,
        World2D,
    )

    data = np.load(path)

    def build(cls, prefix):
        kw = {}
        for f in dataclasses.fields(cls):
            key = f"{prefix}{f.name}"
            sub = {
                "bodies": Bodies2D,
                "colliders": Colliders2D,
                "contacts": Contacts2D,
                "joints": Joints2D,
            }.get(f.name)
            if sub is not None and cls is World2D:
                kw[f.name] = build(sub, key + ".")
            elif f.name == "diverged" and key not in data.files:
                kw[f.name] = jax.numpy.zeros((), bool)
            elif (
                f.name in ("swept_ccd", "swept_ccd_nonlinear")
                and key not in data.files
            ):
                # Checkpoints predating the 2D swept-CCD fields.
                kw[f.name] = jax.numpy.zeros(
                    data[f"{prefix}angle"].shape, bool
                )
            else:
                kw[f.name] = jax.numpy.asarray(data[key])
        return cls(**kw)

    return build(World2D, "")


def save_orbax(path: str, world: World) -> None:
    """Checkpoint via orbax (supports sharded arrays across hosts)."""
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, world)
    ckpt.wait_until_finished()


def restore_orbax(path: str, like: World) -> World:
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(path, like)
