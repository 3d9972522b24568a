"""SBMC "Multisteps" — sample-space kernel-splatting denoiser.

TPU-native rebuild of the [Gharbi 2019] backbone the reference imports
from the external ``sbmc`` package (reference train_sbmc.py:30,80-94).
Observable contract reproduced: input ``{'radiance' (B,S,H,W,3),
'features' (B,S,H,W,C)}``, output a denoised image ``(B,H,W,3)`` of the
same spatial size (reference interfaces.py:420-445); internally a
per-sample embedding, multiple rounds of sample<->pixel context
propagation through a U-Net, and per-sample splatting kernels whose
accumulated contribution is weight-normalized.

The splat runs through the Pallas scatter op on TPU
(:mod:`wcmc_tpu.ops.splat`).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from wcmc_tpu.models.blocks import ConvChain, UNet
from wcmc_tpu.ops.splat import splat_normalized


class Multisteps(nn.Module):
    n_in: int
    ksize: int = 21
    n_steps: int = 3
    width: int = 128
    dtype: jnp.dtype | None = None   # bf16 compute on TPU; params stay f32
    # sample-parallel mode: spp axis sharded over this mesh axis; the
    # sample-context means and splat normalization become collectives
    sample_axis_name: str | None = None

    @nn.compact
    def __call__(self, batch: dict) -> jnp.ndarray:
        radiance = batch["radiance"]
        features = batch["features"]
        b, s, h, w, f = features.shape
        assert f == self.n_in, f"Multisteps expects {self.n_in} channels, got {f}"

        x = features.reshape(b * s, h, w, f)
        x = ConvChain(
            self.width, width=self.width, depth=3, ksize=1, pad=False,
            output_type="leaky_relu", hidden_activation="leaky_relu",
            dtype=self.dtype, name="embedding",
        )(x)

        for step in range(self.n_steps):
            ctx = x.reshape(b, s, h, w, self.width).mean(axis=1)
            if self.sample_axis_name is not None:
                import jax

                ctx = jax.lax.pmean(ctx, self.sample_axis_name)
            ctx = UNet(
                self.width, num_levels=3, increase_factor=2.0, num_convs=3,
                width=self.width, ksize=3, output_type="leaky_relu",
                pooling="max", dtype=self.dtype, name=f"propagation_{step}",
            )(ctx)
            ctx = jnp.broadcast_to(
                ctx[:, None], (b, s, h, w, self.width)
            ).reshape(b * s, h, w, self.width)
            x = ConvChain(
                self.width, width=self.width, depth=2, ksize=1, pad=False,
                output_type="leaky_relu", hidden_activation="leaky_relu",
                dtype=self.dtype, name=f"update_{step}",
            )(jnp.concatenate([x.astype(ctx.dtype), ctx], axis=-1))

        logits = nn.Conv(
            self.ksize**2, (1, 1), dtype=self.dtype, name="kernel_head"
        )(x).astype(jnp.float32)
        weights = nn.softmax(logits, axis=-1).reshape(
            b, s, h, w, self.ksize**2
        )
        return splat_normalized(
            radiance, weights, self.ksize,
            sample_axis_name=self.sample_axis_name,
        )

    def __str__(self):
        return f"Multisteps i{self.n_in} k{self.ksize} s{self.n_steps} w{self.width}"
