"""Device-mesh parallelism: sharding helpers and cross-host collectives."""

from gim_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, replicate, data_parallel_apply)
