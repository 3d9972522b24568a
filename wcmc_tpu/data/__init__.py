from wcmc_tpu.data import schema
from wcmc_tpu.data.preprocess import (
    preprocess_llpm,
    preprocess_sbmc,
    preprocess_kpcn,
)
from wcmc_tpu.data.synthetic import synthetic_raw_sample, synthetic_ground_truth
