from wcmc_tpu.utils.utils import (
    crop_like,
    tonemap_reinhard,
    tonemap_reinhard_lum,
    linear_to_srgb,
    tonemap_batch,
)
