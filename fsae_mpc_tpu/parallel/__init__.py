from .mesh import (BATCH_AXIS, make_mesh, initialize_distributed, shard_batch,
                   replicate, sharded_batch_apply, pmean_metrics)
