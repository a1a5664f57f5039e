from evo_tpu.parallel.mesh import (  # noqa: F401
    get_mesh,
    make_mesh,
    shard_blocked,
    replicate,
    pprint,
    gather_to_host,
)
from evo_tpu.parallel.distributed import (  # noqa: F401
    init_distributed,
    make_global_array,
    make_global_data,
    distribute_tree,
    distribute_estate,
    gather_global,
)
