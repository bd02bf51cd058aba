from css_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicate,
    conformer_tp_spec,
    shard_params,
)
from css_tpu.parallel.dp import (  # noqa: F401
    DataParallel,
    ReplicaAveraging,
)
