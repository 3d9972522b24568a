"""KPCN — kernel-predicting convolutional network (diffuse/specular).

TPU-native rebuild of the [Bako 2017] backbone the reference imports
from the external ``sbmc`` package (reference train_kpcn.py:30,213,229).
Observable contract reproduced exactly:

* ``forward(batch)`` reads ``kpcn_diffuse_in`` / ``kpcn_specular_in`` /
  ``kpcn_diffuse_buffer`` / ``kpcn_specular_buffer`` / ``kpcn_albedo``
  and returns ``{'radiance', 'diffuse', 'specular'}``
  (reference interfaces.py:203-211);
* geometry: 9 stacked 5x5 VALID convs (-36 px) + 21x21 valid softmax
  kernel application (-20 px) => a 128 px patch yields a 72 px output
  (reference test_models.py:218-219);
* recombination ``diffuse * albedo + exp(specular) - 1``
  (reference datasets.py:1236).

The kernel application runs through the Pallas gather op on TPU.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from wcmc_tpu.models.blocks import ConvChain
from wcmc_tpu.ops.kernel_apply import kernel_apply
from wcmc_tpu.utils.utils import crop_like


def pad_like(kernels, ksize):
    """Shape token: the buffer extent matching a kernel grid —
    kernels' spatial size + (ksize - 1) on each axis."""
    b, h, w, _ = kernels.shape
    return jnp.zeros((b, h + ksize - 1, w + ksize - 1, 1))


class KPCN(nn.Module):
    n_in: int
    ksize: int = 21
    depth: int = 9
    width: int = 100
    dtype: jnp.dtype | None = None   # bf16 compute on TPU; params stay f32
    # NOTE(perf): fused=True routes the conv chains through the Pallas
    # implicit-GEMM kernel (ops/conv5.py) — ~1.3x XLA's conv emitter on
    # the forward pass, but the custom-call boundary breaks XLA's
    # cross-layer dgrad/wgrad fusions (54.5 -> 59.6 ms/step measured),
    # so it is reserved for primal-only uses: validation and full-frame
    # inference. Param tree is identical either way — the same
    # checkpoint serves both variants.
    fused: bool = False

    @property
    def shrink(self) -> int:
        """Total spatial shrink: conv chain + valid kernel window."""
        return self.depth * 4 + (self.ksize - 1)

    @nn.compact
    def __call__(self, batch: dict) -> dict:
        # NOTE(perf): running both branches as one nn.vmap'd ConvChain
        # was measured SLOWER on v5e (78.6 vs 71.8 ms/step) — XLA
        # lowers vmapped-filter convolutions poorly — so the branches
        # stay as two plain chains; only the kernel application below
        # is batched across branches.
        # NOTE(perf): kernel logits stay in the chain's compute dtype
        # (bf16 on TPU) — the conv already computed in bf16, so an f32
        # upcast adds no information but doubles the HBM traffic of the
        # dominant (B, h, w, K^2) tensor through the crop/transpose
        # boundary and the Pallas kernel reads (in-kernel softmax math
        # is f32 regardless).
        k_diffuse = ConvChain(
            self.ksize**2, width=self.width, depth=self.depth, ksize=5,
            pad=False, fused=self.fused, dtype=self.dtype, name="diffuse",
        )(batch["kpcn_diffuse_in"])
        k_specular = ConvChain(
            self.ksize**2, width=self.width, depth=self.depth, ksize=5,
            pad=False, fused=self.fused, dtype=self.dtype,
            name="specular",
        )(batch["kpcn_specular_in"])
        kernels = jnp.stack([k_diffuse, k_specular], axis=0)

        # Valid-window geometry: keep only kernel positions whose full
        # K x K window lies inside the conv-output grid.  The buffers
        # are center-cropped to that grid, the kernels lose K-1 more
        # pixels, and gather aligns each output pixel with the window
        # centered on it (total shrink: 4*depth + ksize - 1 = 56 for
        # the 128 -> 72 reference contract, test_models.py:218-219).
        r = self.ksize // 2
        k_both = kernels[:, :, r:-r, r:-r, :]
        token = pad_like(k_both[0], self.ksize)
        b_both = jnp.stack(
            [
                crop_like(batch["kpcn_diffuse_buffer"], token),
                crop_like(batch["kpcn_specular_buffer"], token),
            ],
            axis=0,
        )
        # one fused kernel-apply over both branches (leading axes merged)
        nb, b = k_both.shape[0], k_both.shape[1]
        r_both = kernel_apply(
            b_both.reshape((nb * b,) + b_both.shape[2:]),
            k_both.reshape((nb * b,) + k_both.shape[2:]),
            self.ksize, softmax=True,
        ).reshape((nb, b) + k_both.shape[2:4] + (3,))
        r_diffuse, r_specular = r_both[0], r_both[1]

        albedo = crop_like(batch["kpcn_albedo"], r_diffuse)
        radiance = albedo * r_diffuse + jnp.expm1(r_specular)
        return {
            "radiance": radiance,
            "diffuse": r_diffuse,
            "specular": r_specular,
        }

    def __str__(self):
        return f"KPCN i{self.n_in} k{self.ksize} d{self.depth} w{self.width}"
