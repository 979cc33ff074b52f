"""Parallelism: device mesh, shardings, data-parallel train steps."""

from .mesh import (make_mesh, make_mesh_2d, replicated,
                   batch_sharding, shard_batch, make_dp_train_step,
                   make_2d_train_step)
