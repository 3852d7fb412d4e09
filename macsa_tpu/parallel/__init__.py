from macsa_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    set_kernel_mesh,
    get_kernel_mesh,
    kernel_mesh,
)
