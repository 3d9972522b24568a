from wcmc_tpu.ops.colors import rgb_to_hls
from wcmc_tpu.ops.kernel_apply import kernel_apply, kernel_apply_reference
from wcmc_tpu.ops.splat import kernel_splat, splat_normalized
