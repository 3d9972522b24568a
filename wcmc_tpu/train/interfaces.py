"""Training interfaces: the contract between entry points and models.

Re-design of reference support/interfaces.py for XLA: each interface
compiles ONE donated, jitted train step that fuses the PathNet forward,
feature disentanglement, denoiser forward, losses, backward, gradient
clipping and the per-model Adam updates — where the reference runs
separate ``.backward()`` / ``clip_grad`` / ``optim.step`` host calls
per model per batch (reference interfaces.py:122-271).

Public surface parity: ``to_train_mode / preprocess / train_batch /
validate_batch / to_eval_mode / get_epoch_summary`` with the same
``models`` / ``optims`` / ``loss_funcs`` dict naming scheme, the same
loss-dict keys, the same disentanglement modes (m11r11/m10r01/m11r01/
m10r11, reference interfaces.py:139-164), and the same fail-fast
non-finite-loss behavior (checked on host every ``finite_check_every``
steps instead of every step, so device dispatch stays pipelined).

Layouts are channels-last: pixel ``(B,H,W,C)``, sample ``(B,S,H,W,C)``.
"""

from __future__ import annotations

import abc
import functools
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from wcmc_tpu.train.state import ModelState
from wcmc_tpu.utils.utils import crop_like

Batch = Dict[str, jnp.ndarray]


def split_disentangle(p_buffer, mode: str, axis: int = -1):
    """Split an embedding into (manifold half, reconstruction half)
    along the channel axis (reference interfaces.py:139-164)."""
    c = p_buffer.shape[axis]
    half = c // 2
    lo = [slice(None)] * (axis % p_buffer.ndim) + [slice(None, half)]
    hi = [slice(None)] * (axis % p_buffer.ndim) + [slice(half, None)]
    lo, hi = tuple(lo), tuple(hi)
    if mode == "m11r11":
        return p_buffer, p_buffer
    if mode == "m10r01":
        return p_buffer[hi], p_buffer[lo]
    if mode == "m11r01":
        return p_buffer, p_buffer[lo]
    if mode == "m10r11":
        return p_buffer[hi], p_buffer
    raise ValueError(f"unknown disentangle mode {mode!r}")


def crop_hw(x, h_t: int, w_t: int):
    """Center-crop the LAST TWO (spatial) dims — the channel-major
    counterpart of utils.crop_like."""
    dh = (x.shape[-2] - h_t) // 2
    dw = (x.shape[-1] - w_t) // 2
    return x[..., dh:dh + h_t, dw:dw + w_t]


def p_buffer_variance(p_buffer):
    """Detached per-pixel embedding variance / spp
    (reference interfaces.py:165-168).  (B,S,H,W,C) -> (B,H,W,1).

    Unbiased (ddof=1) sample variance, matching torch ``.var(1)``.

    Reference-semantics formulation: the production interfaces compute
    this feature from the fused kernels' VMEM moment accumulators
    (``_dual_pathnet_with_moments`` + ``_variance_feature``) without
    materializing the (B,S,H,W,C) buffer; this function is the golden
    definition those moments are tested against
    (tests/test_mlp_fused.py) and the API for custom interfaces."""
    s = p_buffer.shape[1]
    v = p_buffer.var(axis=1, ddof=1).mean(axis=-1, keepdims=True) / s
    return jax.lax.stop_gradient(v)


def _tree_all_finite(tree) -> jnp.ndarray:
    leaves = [jnp.all(jnp.isfinite(x)) for x in jax.tree_util.tree_leaves(tree)]
    return functools.reduce(jnp.logical_and, leaves, jnp.bool_(True))


class BaseInterface(abc.ABC):
    """Owns model defs + functional states and the compiled step fns."""

    def __init__(
        self,
        models: Dict[str, Any],
        states: Dict[str, ModelState],
        optims: Dict[str, Any],
        loss_funcs: Dict[str, Callable],
        args=None,
        visual: bool = False,
        use_llpm_buf: bool = False,
        manif_learn: bool = False,
        w_manif: float = 0.1,
        seed: int = 0,
        finite_check_every: int = 100,
    ):
        self.models = models
        self.states = states
        self.optims = optims
        self.loss_funcs = loss_funcs
        self.args = args
        self.visual = visual
        self.use_llpm_buf = use_llpm_buf
        self.manif_learn = manif_learn
        self.w_manif = w_manif

        self.iters = 0
        self.m_losses: Dict[str, jnp.ndarray] = {}
        self.best_err = 1e10
        self.fixed_batch = None
        self.finite_check_every = finite_check_every

        # optional debug: dump the p-buffer as PNG every N iters
        # (reference interfaces.py:130-137 dumps every 1000)
        self.pbuf_dump_dir: str | None = None
        self.pbuf_dump_every: int = 1000

        self._key = jax.random.PRNGKey(seed)
        self._train_step = jax.jit(self._make_train_step(), donate_argnums=(0,))
        self._val_step = jax.jit(self._make_val_step())

    def _maybe_dump_pbuffer(self, batch):
        if self.pbuf_dump_dir is None or not self.use_llpm_buf:
            return
        if self.iters % self.pbuf_dump_every != 1:
            return
        import os

        from wcmc_tpu.utils.img_utils import write_img

        os.makedirs(self.pbuf_dump_dir, exist_ok=True)
        _, p_buffers, _ = self._val_step(self.states, batch)
        if p_buffers is None:
            return
        if not isinstance(p_buffers, dict):
            p_buffers = {"p": p_buffers}
        for name, pb in p_buffers.items():
            img = np.clip(
                np.asarray(pb)[0, :, :, :, :3].mean(axis=0), 0.0, 1.0
            )
            write_img(
                os.path.join(
                    self.pbuf_dump_dir, f"pbuf_{name}_{self.iters}.png"
                ),
                img,
            )

    def _val_model(self, name: str = "dncnn"):
        """Model variant for primal-only (validation/inference) steps.

        Backbones exposing a ``fused`` switch (KPCN) can route their
        conv chains through the Pallas implicit-GEMM kernel
        (ops/conv5.py) here; the param tree is identical, so both
        variants share states.  NOTE(perf): default OFF — the kernel
        wins layer microbenches (~1.3x XLA fwd at KPCN shapes) but
        LOSES in context on v5e: train step 54.5 -> 59.6 ms (custom-
        call boundary breaks XLA's cross-layer autodiff fusions) and
        128-px-tile inference 5.8 -> 10.8 ms per 8-tile batch (per-
        layer band padding + unfused epilogues).  Re-evaluate at wide
        band shapes (W ~ 1920) where the band geometry fits; until it
        wins in context, XLA convs are the production path."""
        import os

        m = self.models[name]
        if hasattr(m, "fused") and os.environ.get(
            "WCMC_FUSED_INFERENCE", "0"
        ) == "1":
            return m.clone(fused=True)
        return m

    # -- subclass hooks -----------------------------------------------------
    @abc.abstractmethod
    def _make_train_step(self):
        """Return fn(states, batch, key) -> (new_states, loss_dict)."""

    @abc.abstractmethod
    def _make_val_step(self):
        """Return fn(states, batch) -> (radiance, p_buffers, l_test)."""

    # -- shared machinery ---------------------------------------------------
    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _apply_updates(self, grads, states, names):
        new_states = dict(states)
        for name in names:
            tx = self.optims["optim_" + name]
            updates, new_opt = tx.update(
                grads[name], states[name].opt_state, states[name].params
            )
            new_states[name] = ModelState(
                params=optax.apply_updates(states[name].params, updates),
                opt_state=new_opt,
            )
        return new_states

    def to_train_mode(self):
        for model_name in self.models:
            assert "optim_" + model_name in self.optims, (
                f"`optim_{model_name}`: an optimization algorithm is not defined."
            )

    def to_eval_mode(self):
        self.m_losses["m_val"] = jnp.float32(0.0)

    def train_batch(self, batch: Batch, grad_hook_mode: bool = False):
        if grad_hook_mode:  # forward/backward without updating (debug)
            _, loss_dict = self._train_step(
                jax.tree_util.tree_map(jnp.copy, self.states),
                batch,
                self._next_key(),
            )
            return loss_dict
        self._maybe_dump_pbuffer(batch)
        self.states, loss_dict = self._train_step(
            self.states, batch, self._next_key()
        )
        self._logging(loss_dict)
        return loss_dict

    def validate_batch(self, batch: Batch):
        radiance, p_buffers, l_test = self._val_step(self.states, batch)
        acc = self.m_losses.get("m_val", jnp.float32(0.0))
        self.m_losses["m_val"] = acc + l_test
        return radiance, p_buffers

    def _logging(self, loss_dict):
        for key, val in loss_dict.items():
            acc = self.m_losses.get("m_" + key, jnp.float32(0.0))
            self.m_losses["m_" + key] = acc + val
        if self.iters <= 1 or self.iters % self.finite_check_every == 0:
            for key, val in loss_dict.items():
                if not np.isfinite(np.asarray(val)).all():
                    raise RuntimeError(
                        f"{key}: Non-finite loss at train time."
                    )

    def get_epoch_summary(self, mode: str, norm: int) -> float:
        # /(norm * 2) preserved from the reference's two-branch
        # accounting (reference interfaces.py:320-333).
        if mode == "train":
            parts = []
            for key in list(self.m_losses):
                if key == "m_val":
                    continue
                val = float(self.m_losses[key]) / (norm * 2) * 1000
                parts.append(f"{key}: {val:.3f}E-3")
                self.m_losses[key] = jnp.float32(0.0)
            print("[][][] " + "\t".join(parts))
            return -1.0
        return float(self.m_losses["m_val"]) / (norm * 2)

    # parameters exposed for checkpointing
    def state_dicts(self):
        return {name: self.states[name] for name in self.states}

    def to_mesh(self, mesh):
        """Switch to data-parallel execution over a device mesh: states
        replicated, batches sharded on the leading axis, gradients
        all-reduced over ICI by XLA (replaces the reference's
        nn.DataParallel, train_kpcn.py:260-271)."""
        from wcmc_tpu.parallel.mesh import (
            data_parallel_step, replicate, shard_batch,
        )

        self._mesh = mesh
        self.states = replicate(self.states, mesh)
        dp_step = data_parallel_step(self._make_train_step(), mesh)
        # jit once here — wrapping inside val_step would create a fresh
        # jit wrapper (and a retrace) per validate_batch call.
        jitted_val = jax.jit(self._make_val_step())

        def train_step(states, batch, key):
            with mesh:
                return dp_step(states, shard_batch(batch, mesh), key)

        def val_step(states, batch):
            with mesh:
                return jitted_val(states, shard_batch(batch, mesh))

        self._train_step = train_step
        self._val_step = val_step
        return self


# ===========================================================================
# KPCN (image-space, two branches)
# ===========================================================================

class KPCNInterface(BaseInterface):
    """Diffuse/specular branch training with optional path manifold
    (reference interfaces.py:80-333)."""

    REQUIRED_KEYS = (
        "target_total", "target_diffuse", "target_specular",
        "kpcn_diffuse_in", "kpcn_specular_in",
        "kpcn_diffuse_buffer", "kpcn_specular_buffer", "kpcn_albedo",
    )

    def __init__(self, models, states, optims, loss_funcs, args=None,
                 visual=False, use_llpm_buf=False, manif_learn=False,
                 w_manif=0.1, train_branches=True,
                 disentanglement_option="m11r11", **kw):
        if manif_learn:
            assert "backbone_diffuse" in models
            assert "backbone_specular" in models
            assert "l_manif" in loss_funcs
        assert "dncnn" in models
        if train_branches:
            assert "l_diffuse" in loss_funcs and "l_specular" in loss_funcs
        assert "l_recon" in loss_funcs and "l_test" in loss_funcs
        assert disentanglement_option in ("m11r11", "m10r01", "m11r01", "m10r11")
        self.train_branches = train_branches
        self.disentanglement_option = disentanglement_option
        super().__init__(models, states, optims, loss_funcs, args, visual,
                         use_llpm_buf, manif_learn, w_manif, **kw)

    def __str__(self):
        return "KPCNInterface"

    def preprocess(self, batch: Batch = None):
        for k in self.REQUIRED_KEYS:
            assert k in batch, f"batch is missing key {k!r}"
        if self.use_llpm_buf:
            assert "paths" in batch
        self.iters += 1

    # -- functional pieces --------------------------------------------------
    def _dual_pathnet(self, params, batch, cmajor=False):
        """Run the diffuse and specular PathNets as one fused pass.

        NOTE(perf): a vmapped-weights joint forward was measured slower
        on v5e than two sequential applies (XLA lowers vmapped-filter
        convolutions poorly). The block-diagonal dual kernel
        (models/pathnet.py::dual_pathnet_apply) instead doubles the
        per-pixel chains' channel width to full MXU occupancy and reads
        the paths tensor once."""
        from wcmc_tpu.models.pathnet import PathNet, dual_pathnet_apply

        m_d = self.models["backbone_diffuse"]
        m_s = self.models["backbone_specular"]
        if isinstance(m_d, PathNet) and isinstance(m_s, PathNet):
            return dual_pathnet_apply(
                m_d, params["backbone_diffuse"],
                m_s, params["backbone_specular"], batch, cmajor=cmajor,
            )
        p_d = self.models["backbone_diffuse"].apply(
            {"params": params["backbone_diffuse"]}, batch
        )
        p_s = self.models["backbone_specular"].apply(
            {"params": params["backbone_specular"]}, batch
        )
        if cmajor:
            p_d = jnp.transpose(p_d, (0, 1, 4, 2, 3))
            p_s = jnp.transpose(p_s, (0, 1, 4, 2, 3))
        return p_d, p_s

    def _dual_pathnet_with_moments(self, params, batch, cmajor=False):
        """Dual PathNet forward plus per-branch sample moments.

        Returns (p_d, p_s, mean_d, mean_s, var_d, var_s) where mean/var
        are full-channel (B,H,W,outc) f32 over the sample axis. On the
        fused dual path the moments come from VMEM accumulators in the
        head kernel instead of an XLA reduce over (B,S,H,W,C).

        ``cmajor``: p_d/p_s come back (B,S,outc,H,W) — the manifold-loss
        fast path (losses._prep_pair NOTE(perf)); moments unchanged."""
        from wcmc_tpu.models.pathnet import PathNet, dual_pathnet_apply

        m_d = self.models["backbone_diffuse"]
        m_s = self.models["backbone_specular"]
        if isinstance(m_d, PathNet) and isinstance(m_s, PathNet):
            p_d, p_s, (ssum, ssq) = dual_pathnet_apply(
                m_d, params["backbone_diffuse"],
                m_s, params["backbone_specular"], batch, with_moments=True,
                cmajor=cmajor,
            )
            s = p_d.shape[1]
            outc = p_d.shape[2] if cmajor else p_d.shape[-1]
            mean = ssum / s
            # unbiased (ddof=1) sample variance, matching the torch
            # ``.var(1)`` the reference feeds as the variance feature
            # (reference interfaces.py:165-168)
            var = jnp.maximum(ssq / s - mean * mean, 0.0) * (
                s / max(s - 1, 1)
            )
            return (p_d, p_s, mean[..., :outc], mean[..., outc:],
                    var[..., :outc], var[..., outc:])
        p_d, p_s = self._dual_pathnet(params, batch)
        out = (p_d, p_s, p_d.mean(axis=1), p_s.mean(axis=1),
               p_d.var(axis=1, ddof=1), p_s.var(axis=1, ddof=1))
        if cmajor:
            out = (jnp.transpose(p_d, (0, 1, 4, 2, 3)),
                   jnp.transpose(p_s, (0, 1, 4, 2, 3))) + out[2:]
        return out

    @staticmethod
    def _variance_feature(var_slice, s):
        """(B,H,W,C) per-channel sample variance -> the detached
        (B,H,W,1) variance/spp input feature (reference
        interfaces.py:165-168)."""
        return jax.lax.stop_gradient(
            var_slice.mean(axis=-1, keepdims=True) / s
        )

    def _forward_with_paths(self, params, batch, for_training=True):
        """PathNet forward + disentangle + input concat.  Returns
        (augmented batch, manifold buffers dict or None). The manifold
        buffers are channel-major (B, S, C, H, W) — the dense layout
        the losses consume (losses._prep_pair NOTE(perf))."""
        p_d, p_s, mean_d, mean_s, var_d, var_s = (
            self._dual_pathnet_with_moments(params, batch,
                                            cmajor=for_training)
        )
        s = p_d.shape[1]
        opt = self.disentanglement_option
        if for_training:  # p_d/p_s are (B, S, C, H, W)
            manif_d, _ = split_disentangle(p_d, opt, axis=2)
            manif_s, _ = split_disentangle(p_s, opt, axis=2)
        else:
            manif_d = manif_s = None
        _, mean_recon_d = split_disentangle(mean_d, opt)
        _, mean_recon_s = split_disentangle(mean_s, opt)
        _, var_recon_d = split_disentangle(var_d, opt)
        _, var_recon_s = split_disentangle(var_s, opt)
        new_batch = dict(batch)
        new_batch["kpcn_diffuse_in"] = jnp.concatenate(
            [batch["kpcn_diffuse_in"], mean_recon_d,
             self._variance_feature(var_recon_d, s)], axis=-1,
        )
        new_batch["kpcn_specular_in"] = jnp.concatenate(
            [batch["kpcn_specular_in"], mean_recon_s,
             self._variance_feature(var_recon_s, s)], axis=-1,
        )
        manif = {"diffuse": manif_d, "specular": manif_s} if for_training else None
        return new_batch, manif

    def _make_train_step(self):
        lf = self.loss_funcs

        def loss_fn(params, batch, key):
            loss_dict = {}
            out_manif = None
            net_batch = batch
            if self.use_llpm_buf:
                net_batch, out_manif = self._forward_with_paths(params, batch)

            out = self.models["dncnn"].apply(
                {"params": params["dncnn"]}, net_batch
            )
            total, diffuse, specular = (
                out["radiance"], out["diffuse"], out["specular"]
            )
            tgt_total = crop_like(batch["target_total"], total)

            if self.train_branches:
                tgt_diffuse = crop_like(batch["target_diffuse"], diffuse)
                tgt_specular = crop_like(batch["target_specular"], specular)
                l_diffuse = lf["l_diffuse"](diffuse, tgt_diffuse)
                l_specular = lf["l_specular"](specular, tgt_specular)
                loss_dict["l_diffuse"] = l_diffuse
                loss_dict["l_specular"] = l_specular
                loss = l_diffuse + l_specular

                if self.manif_learn:
                    kd, ks = jax.random.split(key)
                    h_t, w_t = diffuse.shape[1], diffuse.shape[2]
                    l_md = lf["l_manif"](
                        kd, crop_hw(out_manif["diffuse"], h_t, w_t),
                        tgt_diffuse, cmajor=True,
                    )
                    l_ms = lf["l_manif"](
                        ks, crop_hw(out_manif["specular"], h_t, w_t),
                        tgt_specular, cmajor=True,
                    )
                    loss = loss + self.w_manif * (l_md + l_ms)
                    loss_dict["l_manif_diffuse"] = l_md
                    loss_dict["l_manif_specular"] = l_ms

                loss_dict["l_total"] = jax.lax.stop_gradient(
                    lf["l_recon"](total, tgt_total)
                )
            else:  # post-training the joint system
                loss = lf["l_recon"](total, tgt_total)
                loss_dict["l_total"] = loss

            loss_dict["rmse"] = jax.lax.stop_gradient(
                lf["l_test"](total, tgt_total)
            )
            return loss, loss_dict

        names = list(self.models)

        def step(states, batch, key):
            params = {n: states[n].params for n in names}
            grads, loss_dict = jax.grad(loss_fn, has_aux=True)(
                params, batch, key
            )
            new_states = self._apply_updates(grads, states, names)
            return new_states, loss_dict

        return step

    def _make_val_step(self):
        lf = self.loss_funcs
        dncnn = self._val_model("dncnn")

        def step(states, batch):
            params = {n: states[n].params for n in states}
            p_buffers = None
            net_batch = batch
            if self.use_llpm_buf:
                p_d, p_s, mean_d, mean_s, var_d, var_s = (
                    self._dual_pathnet_with_moments(params, batch)
                )
                s = p_d.shape[1]
                if self.disentanglement_option in ("m10r01", "m11r01"):
                    c = p_d.shape[-1]
                    p_d, p_s = p_d[..., :c // 2], p_s[..., :c // 2]
                    mean_d, mean_s = mean_d[..., :c // 2], mean_s[..., :c // 2]
                    var_d, var_s = var_d[..., :c // 2], var_s[..., :c // 2]
                p_buffers = {"diffuse": p_d, "specular": p_s}
                net_batch = dict(batch)
                net_batch["kpcn_diffuse_in"] = jnp.concatenate(
                    [batch["kpcn_diffuse_in"], mean_d,
                     self._variance_feature(var_d, s)], axis=-1,
                )
                net_batch["kpcn_specular_in"] = jnp.concatenate(
                    [batch["kpcn_specular_in"], mean_s,
                     self._variance_feature(var_s, s)], axis=-1,
                )
            out = dncnn.apply({"params": params["dncnn"]}, net_batch)
            tgt_total = crop_like(batch["target_total"], out["radiance"])
            l_test = lf["l_test"](out["radiance"], tgt_total)
            return out["radiance"], p_buffers, l_test

        return step


class KPCNRefInterface(KPCNInterface):
    """Oracle ablation: target diffuse/specular concatenated as extra
    inputs (reference interfaces.py:526-585)."""

    def __init__(self, models, states, optims, loss_funcs, args=None,
                 visual=False, use_llpm_buf=False, manif_learn=False,
                 w_manif=0.1, train_branches=True, **kw):
        assert not use_llpm_buf and not manif_learn
        super().__init__(models, states, optims, loss_funcs, args, visual,
                         False, False, w_manif, train_branches, "m11r11", **kw)

    @staticmethod
    def _augment(batch):
        new_batch = dict(batch)
        new_batch["kpcn_diffuse_in"] = jnp.concatenate(
            [batch["kpcn_diffuse_in"], batch["target_diffuse"]], axis=-1
        )
        new_batch["kpcn_specular_in"] = jnp.concatenate(
            [batch["kpcn_specular_in"], batch["target_specular"]], axis=-1
        )
        return new_batch

    def train_batch(self, batch, grad_hook_mode=False):
        return super().train_batch(self._augment(batch), grad_hook_mode)

    def validate_batch(self, batch):
        return super().validate_batch(self._augment(batch))


class KPCNPreInterface(KPCNInterface):
    """Two-phase schedule: (a) pre-train PathNet alone with the manifold
    loss; (b) train KPCN under a frozen PathNet — phase selected by
    ``manif_learn`` (reference interfaces.py:588-750)."""

    def __init__(self, models, states, optims, loss_funcs, args=None,
                 visual=False, manif_learn=False, w_manif=0.1,
                 train_branches=True, **kw):
        super().__init__(models, states, optims, loss_funcs, args, visual,
                         True, manif_learn, w_manif, train_branches,
                         "m11r11", **kw)

    def __str__(self):
        return "KPCNPreInterface"

    def _make_train_step(self):
        lf = self.loss_funcs

        if self.manif_learn:
            backbone_names = ["backbone_diffuse", "backbone_specular"]

            def loss_fn(params, batch, key):
                p_d, p_s = self._dual_pathnet(params, batch, cmajor=True)
                kd, ks = jax.random.split(key)
                l_md = lf["l_manif"](kd, p_d, batch["target_diffuse"],
                                     cmajor=True)
                l_ms = lf["l_manif"](ks, p_s, batch["target_specular"],
                                     cmajor=True)
                loss = self.w_manif * (l_md + l_ms)
                return loss, {"l_manif_diffuse": l_md, "l_manif_specular": l_ms}

            def step(states, batch, key):
                params = {n: states[n].params for n in states}
                grads, loss_dict = jax.grad(loss_fn, has_aux=True)(
                    params, batch, key
                )
                new_states = self._apply_updates(grads, states, backbone_names)
                return new_states, loss_dict

            return step

        def loss_fn(params, batch, key):
            del key
            loss_dict = {}
            net_batch, _ = self._forward_with_paths(params, batch)
            # frozen PathNet: block gradients into the backbones
            net_batch["kpcn_diffuse_in"] = jax.lax.stop_gradient(
                net_batch["kpcn_diffuse_in"]
            )
            net_batch["kpcn_specular_in"] = jax.lax.stop_gradient(
                net_batch["kpcn_specular_in"]
            )
            out = self.models["dncnn"].apply(
                {"params": params["dncnn"]}, net_batch
            )
            total, diffuse, specular = (
                out["radiance"], out["diffuse"], out["specular"]
            )
            tgt_total = crop_like(batch["target_total"], total)
            if self.train_branches:
                tgt_diffuse = crop_like(batch["target_diffuse"], diffuse)
                tgt_specular = crop_like(batch["target_specular"], specular)
                l_diffuse = lf["l_diffuse"](diffuse, tgt_diffuse)
                l_specular = lf["l_specular"](specular, tgt_specular)
                loss = l_diffuse + l_specular
                loss_dict["l_diffuse"] = l_diffuse
                loss_dict["l_specular"] = l_specular
                loss_dict["l_total"] = jax.lax.stop_gradient(
                    lf["l_recon"](total, tgt_total)
                )
            else:
                loss = lf["l_recon"](total, tgt_total)
                loss_dict["l_total"] = loss
            return loss, loss_dict

        def step(states, batch, key):
            params = {n: states[n].params for n in states}
            grads, loss_dict = jax.grad(loss_fn, has_aux=True)(
                params, batch, key
            )
            new_states = self._apply_updates(grads, states, ["dncnn"])
            return new_states, loss_dict

        return step


# ===========================================================================
# SBMC / LBMC (sample-space)
# ===========================================================================

class SBMCInterface(BaseInterface):
    """Sample-space training: the p-buffer joins 'features' on the
    channel axis per sample (reference interfaces.py:336-523)."""

    def __init__(self, models, states, optims, loss_funcs, args=None,
                 visual=False, use_llpm_buf=False, manif_learn=False,
                 w_manif=0.1, use_sbmc_buf=True, disentangle="m11r11", **kw):
        if manif_learn:
            assert "backbone" in models and "l_manif" in loss_funcs
        assert "dncnn" in models
        assert "l_recon" in loss_funcs and "l_test" in loss_funcs
        assert disentangle in ("m11r11", "m10r01", "m11r01", "m10r11")
        self.disentangle = disentangle
        self.use_sbmc_buf = use_sbmc_buf
        super().__init__(models, states, optims, loss_funcs, args, visual,
                         use_llpm_buf, manif_learn, w_manif, **kw)

    def __str__(self):
        return "SBMCInterface"

    def preprocess(self, batch: Batch = None):
        for k in ("target_image", "radiance", "features"):
            assert k in batch, f"batch is missing key {k!r}"
        if self.use_llpm_buf:
            assert "paths" in batch
        self.iters += 1

    def _augment_features(self, params, batch, slice_recon_only=False):
        """PathNet forward + per-sample concat.  Returns
        (augmented batch, manifold buffer, recon buffer)."""
        p_buffer = self.models["backbone"].apply(
            {"params": params["backbone"]}, batch
        )
        if slice_recon_only:
            if self.disentangle in ("m10r01", "m11r01"):
                p_recon = p_buffer[..., :p_buffer.shape[-1] // 2]
            else:
                p_recon = p_buffer
            p_manif = p_recon
        else:
            p_manif, p_recon = split_disentangle(p_buffer, self.disentangle)
        s = p_recon.shape[1]
        # unbiased ddof=1, matching torch .var(1) (reference
        # interfaces.py:394-403)
        p_var = p_recon.var(axis=1, ddof=1).mean(axis=-1, keepdims=True) / s
        p_var = jax.lax.stop_gradient(
            jnp.broadcast_to(p_var[:, None], p_recon.shape[:4] + (1,))
        )
        new_batch = dict(batch)
        new_batch["features"] = jnp.concatenate(
            [batch["features"], p_recon, p_var], axis=-1
        )
        return new_batch, p_manif, p_recon

    def _make_train_step(self):
        lf = self.loss_funcs

        def loss_fn(params, batch, key):
            loss_dict = {}
            out_manif = None
            net_batch = batch
            if self.use_llpm_buf:
                net_batch, out_manif, _ = self._augment_features(params, batch)

            out = self.models["dncnn"].apply(
                {"params": params["dncnn"]}, net_batch
            )
            tgt_total = crop_like(batch["target_image"], out)
            l_total = lf["l_recon"](out, tgt_total)

            if self.manif_learn:
                p_buffer = crop_like(out_manif, out)
                l_manif = lf["l_manif"](key, p_buffer, tgt_total)
                loss_dict["l_manif"] = l_manif
                loss_dict["l_recon"] = l_total
                l_total = l_total + l_manif * self.w_manif

            loss_dict["l_total"] = l_total
            loss_dict["rmse"] = jax.lax.stop_gradient(
                lf["l_test"](out, tgt_total)
            )
            return l_total, loss_dict

        names = list(self.models)

        def step(states, batch, key):
            params = {n: states[n].params for n in names}
            grads, loss_dict = jax.grad(loss_fn, has_aux=True)(
                params, batch, key
            )
            new_states = self._apply_updates(grads, states, names)
            return new_states, loss_dict

        return step

    def _make_val_step(self):
        lf = self.loss_funcs

        def step(states, batch):
            params = {n: states[n].params for n in states}
            p_buffer = None
            net_batch = batch
            if self.use_llpm_buf:
                net_batch, p_buffer, _ = self._augment_features(
                    params, batch, slice_recon_only=True
                )
            out = self.models["dncnn"].apply(
                {"params": params["dncnn"]}, net_batch
            )
            tgt_total = crop_like(batch["target_image"], out)
            return out, p_buffer, lf["l_test"](out, tgt_total)

        return step


class LBMCInterface(SBMCInterface):
    """LBMC variant: SMAPE recon loss, norm clip 250
    (reference interfaces.py:753-839; clipping lives in the optimizer
    chain, see train/state.py)."""

    def __init__(self, models, states, optims, loss_funcs, args=None,
                 use_llpm_buf=False, manif_learn=False, w_manif=0.1,
                 disentangle="m11r11", **kw):
        super().__init__(models, states, optims, loss_funcs, args, False,
                         use_llpm_buf, manif_learn, w_manif, False,
                         disentangle, **kw)

    def __str__(self):
        return "LBMCInterface"
