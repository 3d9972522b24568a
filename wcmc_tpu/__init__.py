"""wcmc_tpu — TPU-native Monte Carlo image reconstruction in the path manifold.

A from-scratch JAX/Flax/Pallas re-design of the capability surface of
Mephisto405/WCMC ("Weakly-Supervised Contrastive Learning in Path Manifold
for Monte Carlo Image Reconstruction", SIGGRAPH 2021):

* path-descriptor extraction + KPCN/SBMC feature preprocessing
  (jit-compiled on device) -- :mod:`wcmc_tpu.data`
* PathNet path-embedding network and the KPCN / SBMC / LBMC denoiser
  backbones as Flax modules -- :mod:`wcmc_tpu.models`
* Pallas TPU kernels for per-pixel kernel application (gather) and
  per-sample kernel splatting (scatter) -- :mod:`wcmc_tpu.ops`
* path-disentangling losses (FeatureMSE, GRS) + train/eval metrics
  -- :mod:`wcmc_tpu.losses`, :mod:`wcmc_tpu.metrics`
* functional training interfaces, checkpointing, and the shared train
  loop -- :mod:`wcmc_tpu.train`
* device-mesh data parallelism and spatially-sharded halo-exchange
  inference -- :mod:`wcmc_tpu.parallel`

Layout conventions (TPU-native, channels-last):

* pixel-space tensors:  ``(B, H, W, C)``
* sample-space tensors: ``(B, S, H, W, C)`` where ``S`` = samples/pixel

Batch-dict key names mirror the reference framework
(``kpcn_diffuse_in``, ``radiance``, ``features``, ``paths``, ...; see
reference support/datasets.py:72-159) so a WCMC user can map their
mental model 1:1, but every array is channels-last.
"""

__version__ = "0.1.0"

from wcmc_tpu.data import schema  # noqa: F401
