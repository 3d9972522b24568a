from wcmc_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_parallel_step,
)
from wcmc_tpu.parallel.halo import (
    make_spatial_inference,
    kpcn_spatial_inference,
)
from wcmc_tpu.parallel.sample import make_sample_parallel
