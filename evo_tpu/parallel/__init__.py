from evo_tpu.parallel.mesh import (  # noqa: F401
    get_mesh,
    make_mesh,
    shard_blocked,
    replicate,
    pprint,
    gather_to_host,
)
