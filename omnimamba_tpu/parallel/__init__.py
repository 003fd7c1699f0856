from omnimamba_tpu.parallel.mesh import create_mesh  # noqa: F401
from omnimamba_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    param_shardings,
    shard_params,
)
