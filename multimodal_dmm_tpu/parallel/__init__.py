"""Parallelism: device mesh, shardings, data-parallel train steps."""

from .mesh import (make_mesh, replicated, batch_sharding, shard_batch,
                   make_dp_train_step)
