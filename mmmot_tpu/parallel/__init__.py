from mmmot_tpu.parallel.mesh import (make_mesh, shard_batch, shard_sequences,
                                     replicate)
