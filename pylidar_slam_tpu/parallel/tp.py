"""Tensor-parallel parameter sharding over the mesh's ``tp`` axis.

Megatron-style weight partitioning expressed the XLA way: parameters (conv
kernels, dense heads) are placed with a ``NamedSharding`` that splits their
feature dimension across ``tp``; GSPMD propagates the layouts through the
jitted train step and inserts the collectives.  No manual all-reduce calls
-- the reference has no model parallelism at all (SURVEY.md section 2.8),
so this axis is a new TPU-native design obligation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def leaf_sharding(shape, mesh: Mesh, axis_name: str = "tp") -> NamedSharding:
    """Sharding rule for one parameter leaf.

    Weights with >= 2 dims split their feature dimension (last, falling back
    to second-to-last) over ``axis_name`` when divisible; everything else
    (biases, scalars, batch stats) replicates.
    """
    tp = mesh.shape[axis_name]
    if tp > 1 and len(shape) >= 2:
        for d in (len(shape) - 1, len(shape) - 2):
            if shape[d] % tp == 0 and shape[d] >= tp:
                spec = [None] * len(shape)
                spec[d] = axis_name
                return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def shard_param_tree(tree, mesh: Mesh, axis_name: str = "tp"):
    """Places every leaf of a parameter/optimizer pytree with its tp sharding.

    Optimizer moments mirror parameter shapes, so the same shape-keyed rule
    keeps them consistently co-sharded with their parameters.
    """
    return jax.tree.map(
        lambda leaf: jax.device_put(
            leaf, leaf_sharding(jnp.shape(leaf), mesh, axis_name)),
        tree)
