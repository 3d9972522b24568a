"""Model/optimizer/interface assembly shared by CLI entry points and tests.

Counterpart of the ``init_model`` functions of the reference entry
points (reference train_kpcn.py:192-341, train_sbmc.py:63-200,
train_lbmc.py:67-204), minus torch-specific machinery: states are
functional pytrees, Adam + clipping live in one optax chain, and the
hyperparameter grid sweep (lr_pnet x pnet_out_size x w_manif,
reference train_kpcn.py:195-200) builds one interface per combination.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import Sequence

import jax
import jax.numpy as jnp

from wcmc_tpu.data import schema
from wcmc_tpu import losses
from wcmc_tpu.models import KPCN, LayerNet, Multisteps, PathNet
from wcmc_tpu.train.state import ModelState, adam_with_clip, init_model_state
from wcmc_tpu.train import interfaces as itf


@dataclass
class TrainConfig:
    """Union of the reference CLI flags relevant to model assembly
    (reference train_kpcn.py:385-424, train_sbmc.py:235-272,
    train_lbmc.py:235-270)."""

    base_model: str = "kpcn"              # kpcn | sbmc | lbmc
    model_name: str = "model"
    batch_size: int = 8
    spp: int = 8
    patch_size: int = schema.PATCH_SIZE

    lr_dncnn: float = 1e-4
    lr_pnet: Sequence[float] = (1e-4,)
    pnet_out_size: Sequence[int] = (3,)
    w_manif: Sequence[float] = (0.1,)

    use_g_buf: bool = True
    use_sbmc_buf: bool = True
    use_llpm_buf: bool = False
    manif_learn: bool = False
    manif_loss: str | None = None          # FMSE | GRS
    local: bool = False                    # FMSE locality flag
    manif_pairing: str = "roll"            # roll (TPU fast path) | permutation
    disentangle: str = "m11r11"

    train_branches: bool = True            # KPCN
    kpcn_ref: bool = False
    kpcn_pre: bool = False

    # TPU-specific knobs
    seed: int = 0
    kpcn_ksize: int = 21
    sbmc_ksize: int = 21
    # "exp" = upstream KernelWeighting log-weights (post-splat
    # normalization, enables per-sample outlier rejection);
    # "softmax" = r3 ablation knob (collapses — models/sbmc.py)
    sbmc_splat: str = "exp"
    finite_check_every: int = 100
    compute_dtype: str = "bfloat16"   # activations; params/optimizer stay f32
    # linear update warmup (sample-space models; see state.adam_with_clip)
    warmup_steps: int = 0

    @property
    def model_dtype(self):
        return {"bfloat16": jnp.bfloat16, "float32": None}[self.compute_dtype]

    def validate(self):
        """Cross-flag rules (reference train_kpcn.py:428-440)."""
        if self.manif_learn and not self.use_llpm_buf:
            raise ValueError(
                "The manifold learning module requires a llpm-specific buffer."
            )
        if self.manif_learn and not self.manif_loss:
            raise ValueError(
                "The manifold learning module requires a manifold loss."
            )
        if not self.manif_learn and self.manif_loss:
            raise ValueError(
                "A manifold loss is not necessary when the manifold learning "
                "module is opted out."
            )
        if self.manif_learn and self.manif_loss not in ("FMSE", "GRS"):
            raise ValueError("manif_loss should be either FMSE or GRS")
        if self.disentangle not in ("m11r11", "m10r01", "m10r11", "m11r01"):
            raise ValueError("unknown disentangle mode")
        for s in self.pnet_out_size:
            if self.disentangle != "m11r11" and s % 2 != 0:
                raise ValueError("pnet_out_size must be even when disentangling")
        return self


def _sample_batch_kpcn(cfg: TrainConfig, channels: schema.ChannelConfig):
    # patch must exceed the KPCN valid shrink (4*depth + ksize - 1)
    shrink = 4 * 9 + cfg.kpcn_ksize - 1
    b, p, s = 1, shrink + 8, 2
    n_in = channels.dncnn_in_size
    z = jnp.zeros
    batch = {
        "target_total": z((b, p, p, 3)),
        "target_diffuse": z((b, p, p, 3)),
        "target_specular": z((b, p, p, 3)),
        "kpcn_diffuse_in": z((b, p, p, n_in)),
        "kpcn_specular_in": z((b, p, p, n_in)),
        "kpcn_diffuse_buffer": z((b, p, p, 3)),
        "kpcn_specular_buffer": z((b, p, p, 3)),
        "kpcn_albedo": z((b, p, p, 3)),
    }
    if channels.use_llpm_buf:
        batch["paths"] = z((b, s, p, p, schema.PATH_CHANNELS))
    return batch


def _sample_batch_sbmc(cfg: TrainConfig, channels: schema.ChannelConfig):
    b, p, s = 1, 32, 2
    batch = {
        "target_image": jnp.zeros((b, p, p, 3)),
        "radiance": jnp.zeros((b, s, p, p, 3)),
        "features": jnp.zeros((b, s, p, p, channels.dncnn_in_size)),
    }
    if channels.use_llpm_buf:
        batch["paths"] = jnp.zeros((b, s, p, p, schema.PATH_CHANNELS))
    return batch


def init_interfaces(cfg: TrainConfig, args=None):
    """Build one interface per hyperparameter-grid combination."""
    cfg.validate()
    out = []
    grid = list(
        itertools.product(cfg.lr_pnet, cfg.pnet_out_size, cfg.w_manif)
    )
    for trial, (lr_pnet, pnet_out, w_manif) in enumerate(grid):
        key = jax.random.PRNGKey(cfg.seed + trial)
        if cfg.base_model == "kpcn":
            iface = _build_kpcn(cfg, lr_pnet, pnet_out, w_manif, key, args)
        elif cfg.base_model == "sbmc":
            iface = _build_sbmc(cfg, lr_pnet, pnet_out, w_manif, key, args)
        elif cfg.base_model == "lbmc":
            iface = _build_lbmc(cfg, lr_pnet, pnet_out, w_manif, key, args)
        else:
            raise ValueError(cfg.base_model)
        # expose the grid point for hyperparameter-encoded checkpoint
        # names (reference train_kpcn.py:233-236)
        iface.grid_params = {
            "lr_pnet": lr_pnet, "pnet_out_size": pnet_out,
            "w_manif": w_manif,
        }
        out.append(iface)
    return out


def sweep_checkpoint_name(save_dir, model_name, interfaces, i):
    """Checkpoint filename for grid trial ``i``: the bare model name for
    a single-point grid, else the reference's hyperparameter-encoded
    ``<name>_lp%f_pos%d_wgt%f`` form (reference train_kpcn.py:233-236,
    train_sbmc.py:102, train_lbmc.py:100)."""
    import os

    if len(interfaces) == 1:
        return os.path.join(save_dir, model_name + ".ckpt")
    gp = getattr(interfaces[i], "grid_params", None)
    if gp is None:  # hand-built interfaces (tests) carry no grid point
        return os.path.join(save_dir, f"{model_name}_trial{i}.ckpt")
    return os.path.join(
        save_dir,
        "%s_lp%f_pos%d_wgt%f.ckpt"
        % (model_name, gp["lr_pnet"], gp["pnet_out_size"], gp["w_manif"]),
    )


def _manif_loss_fn(cfg: TrainConfig):
    return losses.make_manifold_loss(
        cfg.manif_loss, non_local=not cfg.local, pairing=cfg.manif_pairing
    )


def _build_kpcn(cfg, lr_pnet, pnet_out, w_manif, key, args):
    channels = schema.ChannelConfig(
        "kpcn",
        use_llpm_buf=cfg.use_llpm_buf,
        pnet_out_size=pnet_out,
        disentangle=cfg.disentangle,
    )
    n_in = channels.dncnn_in_size + (3 if cfg.kpcn_ref else 0)

    dt = cfg.model_dtype
    models = {"dncnn": KPCN(n_in=n_in, ksize=cfg.kpcn_ksize, dtype=dt)}
    if cfg.use_llpm_buf:
        models["backbone_diffuse"] = PathNet(
            ic=channels.pnet_in_size, outc=pnet_out, dtype=dt
        )
        models["backbone_specular"] = PathNet(
            ic=channels.pnet_in_size, outc=pnet_out, dtype=dt
        )

    sample = _sample_batch_kpcn(cfg, channels)
    # The dncnn init sees the post-concat input channel count.
    dncnn_sample = dict(sample)
    pad = n_in - sample["kpcn_diffuse_in"].shape[-1]
    if pad:
        ext = jnp.zeros(sample["kpcn_diffuse_in"].shape[:-1] + (pad,))
        dncnn_sample["kpcn_diffuse_in"] = jnp.concatenate(
            [sample["kpcn_diffuse_in"], ext], axis=-1
        )
        dncnn_sample["kpcn_specular_in"] = jnp.concatenate(
            [sample["kpcn_specular_in"], ext], axis=-1
        )

    states, optims = {}, {}
    keys = jax.random.split(key, len(models))
    for k, (name, module) in zip(keys, models.items()):
        lr = cfg.lr_dncnn if name == "dncnn" else lr_pnet
        tx = adam_with_clip(lr, clip_value=1.0)
        s = dncnn_sample if name == "dncnn" else sample
        states[name] = init_model_state(module, s, tx, k)
        optims["optim_" + name] = tx

    loss_funcs = {
        "l_diffuse": losses.l1,
        "l_specular": losses.l1,
        "l_recon": losses.l1,
        "l_test": losses.relative_mse,
    }
    if cfg.manif_learn:
        loss_funcs["l_manif"] = _manif_loss_fn(cfg)

    kw = dict(seed=cfg.seed, finite_check_every=cfg.finite_check_every)
    if cfg.kpcn_ref:
        return itf.KPCNRefInterface(
            models, states, optims, loss_funcs, args,
            train_branches=cfg.train_branches, **kw,
        )
    if cfg.kpcn_pre:
        return itf.KPCNPreInterface(
            models, states, optims, loss_funcs, args,
            manif_learn=cfg.manif_learn, w_manif=w_manif,
            train_branches=cfg.train_branches, **kw,
        )
    return itf.KPCNInterface(
        models, states, optims, loss_funcs, args,
        use_llpm_buf=cfg.use_llpm_buf, manif_learn=cfg.manif_learn,
        w_manif=w_manif, train_branches=cfg.train_branches,
        disentanglement_option=cfg.disentangle, **kw,
    )


def _sbmc_like_build(cfg, lr_pnet, pnet_out, key, model_ctor, clip_norm):
    channels = schema.ChannelConfig(
        cfg.base_model,
        use_g_buf=cfg.use_g_buf,
        use_sbmc_buf=cfg.use_sbmc_buf,
        use_llpm_buf=cfg.use_llpm_buf,
        pnet_out_size=pnet_out,
        disentangle=cfg.disentangle,
    )
    n_in = channels.dncnn_in_size
    models = {"dncnn": model_ctor(n_in)}
    if cfg.use_llpm_buf:
        models["backbone"] = PathNet(
            ic=channels.pnet_in_size, outc=pnet_out, dtype=cfg.model_dtype
        )

    base = _sample_batch_sbmc(cfg, channels)
    dncnn_sample = dict(base)
    disk_feats = channels.features_size + (1 if cfg.use_llpm_buf else 0)
    base["features"] = jnp.zeros(base["features"].shape[:-1] + (disk_feats,))
    pad = n_in - disk_feats
    if pad:
        dncnn_sample["features"] = jnp.zeros(
            base["features"].shape[:-1] + (n_in,)
        )

    states, optims = {}, {}
    keys = jax.random.split(key, len(models))
    for k, (name, module) in zip(keys, models.items()):
        lr = cfg.lr_dncnn if name == "dncnn" else lr_pnet
        tx = adam_with_clip(lr, clip_norm=clip_norm,
                            warmup_steps=cfg.warmup_steps)
        s = dncnn_sample if name == "dncnn" else base
        states[name] = init_model_state(module, s, tx, k)
        optims["optim_" + name] = tx
    return models, states, optims


def _build_sbmc(cfg, lr_pnet, pnet_out, w_manif, key, args):
    models, states, optims = _sbmc_like_build(
        cfg, lr_pnet, pnet_out, key,
        lambda n: Multisteps(n_in=n, ksize=cfg.sbmc_ksize,
                             dtype=cfg.model_dtype,
                             splat_weighting=cfg.sbmc_splat),
        clip_norm=1000.0,
    )
    loss_funcs = {
        "l_recon": losses.tonemapped_relative_mse,
        "l_test": losses.relative_mse,
    }
    if cfg.manif_learn:
        loss_funcs["l_manif"] = _manif_loss_fn(cfg)
    return itf.SBMCInterface(
        models, states, optims, loss_funcs, args,
        use_llpm_buf=cfg.use_llpm_buf, manif_learn=cfg.manif_learn,
        w_manif=w_manif, use_sbmc_buf=cfg.use_sbmc_buf,
        disentangle=cfg.disentangle, seed=cfg.seed,
        finite_check_every=cfg.finite_check_every,
    )


def _clamped_smape(im, ref):
    """LBMC recon loss: SMAPE on [0, 100]-clamped radiance
    (reference train_lbmc.py:164-165)."""
    return losses.smape(jnp.clip(im, 0.0, 100.0), jnp.clip(ref, 0.0, 100.0))


def _build_lbmc(cfg, lr_pnet, pnet_out, w_manif, key, args):
    models, states, optims = _sbmc_like_build(
        cfg, lr_pnet, pnet_out, key,
        lambda n: LayerNet(n_in=n, dtype=cfg.model_dtype), clip_norm=250.0,
    )
    loss_funcs = {
        "l_recon": _clamped_smape,
        "l_test": losses.relative_mse,
    }
    if cfg.manif_learn:
        loss_funcs["l_manif"] = _manif_loss_fn(cfg)
    return itf.LBMCInterface(
        models, states, optims, loss_funcs, args,
        use_llpm_buf=cfg.use_llpm_buf, manif_learn=cfg.manif_learn,
        w_manif=w_manif, disentangle=cfg.disentangle, seed=cfg.seed,
        finite_check_every=cfg.finite_check_every,
    )
