"""Assemble model-ready training batches from raw sample dumps.

This is the glue between the preprocessing stage and the interfaces:
given a raw ``(H, W, S, 104)`` dump + ``(H, W, 9)`` GT (from disk cache
or the synthetic generator), produce the channels-last batch dicts each
interface consumes.  Used by tests, benchmarks, and the in-memory
fallback of the dataset pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from wcmc_tpu.data import preprocess, schema, synthetic


def kpcn_batch_from_raw(raw, gt, use_llpm_buf=False):
    """(H,W,S,104) + (H,W,9) -> single-example KPCN batch (B=1)."""
    raw = preprocess.sanitize(jnp.asarray(raw))
    gt = preprocess.sanitize(jnp.asarray(gt))
    buf = preprocess.preprocess_kpcn(raw)
    batch = preprocess.kpcn_net_inputs(buf)
    batch.update(preprocess.kpcn_targets(gt))
    if use_llpm_buf:
        llpm = preprocess.preprocess_llpm(raw)
        pw = llpm[..., :1].mean(axis=2)
        batch["kpcn_diffuse_in"] = jnp.concatenate(
            [batch["kpcn_diffuse_in"], pw], axis=-1
        )
        batch["kpcn_specular_in"] = jnp.concatenate(
            [batch["kpcn_specular_in"], pw], axis=-1
        )
        # sample-space 'paths' is (S, H, W, 36) before batching
        batch["paths"] = jnp.transpose(llpm[..., 1:], (2, 0, 1, 3))
    return {k: v[None] for k, v in batch.items()}


def sbmc_batch_from_raw(raw, gt, use_g_buf=True, use_sbmc_buf=True,
                        use_llpm_buf=False):
    """(H,W,S,104) + (H,W,9) -> single-example SBMC/LBMC batch (B=1)."""
    raw = preprocess.sanitize(jnp.asarray(raw))
    gt = preprocess.sanitize(jnp.asarray(gt))
    s_buf, p_buf = preprocess.preprocess_sbmc(raw)
    d = preprocess.sbmc_features(
        s_buf, p_buf if use_sbmc_buf else None, use_g_buf, use_sbmc_buf
    )
    # (H, W, S, C) -> (S, H, W, C)
    batch = {
        "radiance": jnp.transpose(d["radiance"], (2, 0, 1, 3)),
        "features": jnp.transpose(d["features"], (2, 0, 1, 3)),
        "target_image": gt[..., :3],
    }
    if use_llpm_buf:
        llpm = preprocess.preprocess_llpm(raw)
        pw = jnp.transpose(llpm[..., :1], (2, 0, 1, 3))
        batch["features"] = jnp.concatenate([batch["features"], pw], axis=-1)
        batch["paths"] = jnp.transpose(llpm[..., 1:], (2, 0, 1, 3))
    return {k: v[None] for k, v in batch.items()}


def _stack(dicts):
    return {
        k: jnp.concatenate([d[k] for d in dicts], axis=0) for k in dicts[0]
    }


def synthetic_batch(
    rng: np.random.Generator,
    base_model: str,
    batch_size: int = 2,
    patch: int = 32,
    spp: int = 4,
    use_llpm_buf: bool = False,
    use_sbmc_buf: bool = True,
):
    """Model-ready random batch for tests/benchmarks."""
    examples = []
    for _ in range(batch_size):
        raw, gt = synthetic.synthetic_raw_sample(rng, patch, patch, spp)
        if base_model == "kpcn":
            examples.append(kpcn_batch_from_raw(raw, gt, use_llpm_buf))
        else:
            examples.append(
                sbmc_batch_from_raw(
                    raw, gt,
                    use_sbmc_buf=(use_sbmc_buf and base_model == "sbmc"),
                    use_llpm_buf=use_llpm_buf,
                )
            )
    return _stack(examples)
