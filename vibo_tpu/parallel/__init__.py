"""Parallelism layer: device mesh + sharding rules.

The reference is single-process/single-device (SURVEY.md section 3.2); this
layer is the TPU-native capability it lacks. Scaling axes for IRT are
students (data parallel) and items (model parallel for very wide matrices):
a 2D ('students', 'items') mesh, NamedSharding annotations on the batch and
the per-item parameter pytree, and XLA/GSPMD inserting the ICI collectives
(loss/grad psum across student shards, item-parameter all-gathers).
"""

from vibo_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, param_shardings, replicated,
)
