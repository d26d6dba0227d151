from .partition import PartitionInfo, partition_by_dst, unstack_local  # noqa: F401
from .dp import (  # noqa: F401
    DPGNN,
    dp_apply,
    halo_bytes,
    halo_exchange,
    halo_gather,
    make_mesh,
    shard_stacked,
)
