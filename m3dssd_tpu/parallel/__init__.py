from .mesh import (make_mesh, shard_batch, replicate_state, put_global,
                   per_host_data_slicing_ok,
                   DATA_AXIS, SPATIAL_AXIS, MODEL_AXIS)
