from valley_tpu.parallel.mesh import create_mesh, local_mesh
from valley_tpu.parallel.sharding import (batch_sharding,
                                          opt_state_shardings,
                                          param_shardings, shard_batch,
                                          shard_params)
