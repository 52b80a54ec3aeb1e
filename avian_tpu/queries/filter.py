"""Query filtering (the reference's ``SpatialQueryFilter``,
``src/spatial_query/query_filter.rs``): layer mask + excluded colliders."""

from dataclasses import dataclass, field, fields

import jax
import jax.numpy as jnp


def _register(cls):
    jax.tree_util.register_dataclass(
        cls, data_fields=[f.name for f in fields(cls)], meta_fields=[]
    )
    return cls


@_register
@dataclass(frozen=True)
class QueryFilter:
    """mask: layers the query interacts with; excluded: bool[M] collider
    exclusion mask (or scalar False for none)."""

    mask: jnp.ndarray = field(
        default_factory=lambda: jnp.asarray(0xFFFFFFFF, jnp.uint32)
    )
    excluded: jnp.ndarray = field(
        default_factory=lambda: jnp.zeros((), bool)
    )


def collider_query_mask(colliders, qfilter: QueryFilter):
    """bool[M]: colliders this query may hit (layers.rs:423 semantics)."""
    ok = colliders.active & (
        (colliders.layer_members & qfilter.mask) > 0
    )
    return ok & ~jnp.broadcast_to(qfilter.excluded, ok.shape)
