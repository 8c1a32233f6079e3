from .mesh import (make_mesh, shard_batch, replicate_state,
                   DATA_AXIS, SPATIAL_AXIS, MODEL_AXIS)
