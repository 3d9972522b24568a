"""PathNet — the path embedding network.

Faithful-capability redesign of the one novel model in the reference
(reference support/networks.py:7-42): per-sample 1x1 embedding, mean
reduction over the sample axis, U-Net context propagation, broadcast
concat, 1x1 head.

Layout: input ``batch['paths']`` is ``(B, S, H, W, 36)`` channels-last;
output is ``(B, S, H, W, outc)``.  The per-sample 1x1 chains run on the
flattened ``(B*S, H, W, C)`` view, which XLA lowers to large batched
matmuls on the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from wcmc_tpu.models.blocks import ConvChain, UNet


class PathNet(nn.Module):
    ic: int = 36
    intermc: int = 64
    outc: int = 3
    dtype: jnp.dtype | None = None   # bf16 compute on TPU; params stay f32
    # sample-parallel mode: when set, the spp axis is sharded over this
    # mesh axis and the sample-mean reduction becomes a pmean over ICI
    sample_axis_name: str | None = None

    @nn.compact
    def __call__(self, samples: dict) -> jnp.ndarray:
        paths = samples["paths"]
        b, s, h, w, nf = paths.shape
        assert nf == self.ic, f"PathNet expects {self.ic} path channels, got {nf}"

        flat = paths.reshape(b * s, h, w, nf)
        flat = ConvChain(
            self.intermc, width=self.intermc, depth=3, ksize=1, pad=False,
            dtype=self.dtype, name="embedding",
        )(flat)

        reduced = flat.reshape(b, s, h, w, self.intermc).mean(axis=1)
        if self.sample_axis_name is not None:
            import jax

            reduced = jax.lax.pmean(reduced, self.sample_axis_name)
        propagated = UNet(
            self.intermc, num_levels=3, increase_factor=2.0, num_convs=3,
            width=self.intermc, ksize=3, output_type="leaky_relu",
            pooling="max", dtype=self.dtype, name="propagation",
        )(reduced)

        context = jnp.broadcast_to(
            propagated[:, None], (b, s, h, w, self.intermc)
        ).reshape(b * s, h, w, self.intermc)
        joint = jnp.concatenate([flat.astype(context.dtype), context], axis=-1)

        out = ConvChain(
            self.outc, width=2 * self.intermc, depth=2, ksize=1, pad=False,
            output_type="relu", dtype=self.dtype, name="final",
        )(joint)
        return out.reshape(b, s, h, w, self.outc).astype(jnp.float32)

    def __str__(self):
        return f"PathNet i{self.ic}in{self.intermc}o{self.outc}"
