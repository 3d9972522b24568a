"""Sample-space manifold experiment: SBMC and LBMC with/without the
path-manifold add-on (VERDICT r2 item 3).

Same methodology as scripts/manifold_experiment.py: synthetic frames
preprocessed ON DEVICE, staged once, fresh random patches cut on
device every step, steps chained through lax.scan.  Reference recipes:
SBMC lr 5e-4 (reference train_sbmc.py:218-231) with the TPU warmup
extension (state.adam_with_clip — lr 5e-4 cold-start saturates the
output head on small corpora, r2 capacity study); LBMC lr 1e-4 with
StepLR(3, 0.5) (reference train_lbmc.py:84-93,222-231).

Writes per-epoch JSONL to experiments/sample_space/<cfg>_s<seed>.jsonl
plus checkpoints and a summary CSV.
"""
import sys, os, json, time, argparse
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# honor JAX_PLATFORMS=cpu for smoke runs (the env var alone is
# sometimes ignored when the axon plugin is registered)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "experiments", "sample_space")

CONFIGS = {
    "sbmc": dict(base_model="sbmc", use_llpm_buf=False, manif_learn=False,
                 manif_loss=None, lr_dncnn=5e-4),
    "sbmc_fmse": dict(base_model="sbmc", use_llpm_buf=True, manif_learn=True,
                      manif_loss="FMSE", lr_dncnn=5e-4),
    "lbmc": dict(base_model="lbmc", use_llpm_buf=False, manif_learn=False,
                 manif_loss=None, lr_dncnn=1e-4),
    "lbmc_fmse": dict(base_model="lbmc", use_llpm_buf=True, manif_learn=True,
                      manif_loss="FMSE", lr_dncnn=1e-4),
    # divergence-diagnosis control (r5): the learned p-buffer features
    # WITHOUT the manifold gradient — separates "extra pathnet-coupled
    # input channels shift the early-training basin" from "the FMSE
    # gradient destabilizes LayerNet" (lbmc_fmse_s1 plateaued at 941
    # with manif carrying ~0.2% of the gradient norm, so the gradient
    # story was always suspect)
    "lbmc_buf": dict(base_model="lbmc", use_llpm_buf=True, manif_learn=False,
                     manif_loss=None, lr_dncnn=1e-4),
}


def bf16_cast(k, v):
    import jax.numpy as jnp

    if k in ("paths", "radiance", "features"):
        return v.astype(jnp.bfloat16)
    return v


def build_frames(n_scenes, size, spp, seed):
    """Host generates raw dumps; the jax feature pipeline runs on
    device and the frames stay resident (llpm superset: vanilla strips
    the pw channel + paths in-step)."""
    import functools

    import jax

    from wcmc_tpu.data import synthetic
    from wcmc_tpu.data.batches import sbmc_batch_from_raw

    @functools.partial(jax.jit, donate_argnums=(0,))
    def prep(raw, gt):
        f = sbmc_batch_from_raw(raw, gt, use_llpm_buf=True)
        return {k: bf16_cast(k, v) for k, v in f.items()}

    frames = []
    rng = np.random.default_rng(seed)
    for i in range(n_scenes):
        raw, gt = synthetic.synthetic_raw_sample(rng, size, size, spp)
        frames.append(prep(raw, gt))
        if (i + 1) % 8 == 0:
            print(f"  built {i + 1}/{n_scenes} scenes", flush=True)
    return frames


def make_view(base, use_llpm):
    """Superset corpus (g-buf 24 + sbmc p-buf 66 + pw, plus paths) ->
    the feature slice each config trains on: SBMC keeps everything,
    LBMC drops the sbmc-specific p-buf block (it runs g-buf only,
    reference train_lbmc.py:222-231), vanilla configs drop the pw
    channel and the paths tensor."""
    import jax.numpy as jnp

    from wcmc_tpu.data import schema

    g_size = schema.ChannelConfig(
        "sbmc", use_g_buf=True, use_sbmc_buf=False,
    ).features_size

    def view(batch):
        b = dict(batch)
        feats = b["features"]
        if base == "lbmc":
            g = feats[..., :g_size]
            feats = (jnp.concatenate([g, feats[..., -1:]], axis=-1)
                     if use_llpm else g)
        elif not use_llpm:
            feats = feats[..., :-1]
        b["features"] = feats
        if not use_llpm:
            b.pop("paths", None)
        return b

    return view


def make_chunk_runner(iface, corpus, base):
    import jax
    import jax.numpy as jnp

    from wcmc_tpu.data.device_corpus import _crop_frames

    raw_step = iface._make_train_step()
    patch = corpus.patch
    view = make_view(base, iface.use_llpm_buf)

    # frames MUST be a jit argument, not a closure: captured device
    # arrays lower to HLO constants and the ~2.4 GB program broke the
    # axon remote-compile tunnel (r4: 40 min, then Broken pipe)
    @jax.jit
    def run_chunk(states, frames, ids, ys, xs, key):
        def body(states, inp):
            i, y, x, j = inp
            batch = view(_crop_frames(frames, i, y, x, patch))
            states, ld = raw_step(states, batch, jax.random.fold_in(key, j))
            return states, ld

        steps = jnp.arange(ids.shape[0])
        states, lds = jax.lax.scan(body, states, (ids, ys, xs, steps))
        return states, jax.tree_util.tree_map(
            lambda v: jnp.mean(v.astype(jnp.float32)), lds)

    def call(states, ids, ys, xs, key):
        return run_chunk(states, corpus.frames, ids, ys, xs, key)

    return call


def val_relmse(iface, val_batches, base):
    import jax.numpy as jnp

    from wcmc_tpu import metrics
    from wcmc_tpu.utils.utils import crop_like

    view = make_view(base, iface.use_llpm_buf)
    vals, inputs = [], []
    for b in val_batches:
        b = view(b)
        out, _ = iface.validate_batch(b)
        out = np.asarray(out)
        tgt = np.asarray(crop_like(b["target_image"], jnp.asarray(out)))
        noisy = np.asarray(crop_like(
            b["radiance"].astype(jnp.float32).mean(axis=1), jnp.asarray(out)
        ))
        vals.append(metrics.RelMSE(out, tgt))
        inputs.append(metrics.RelMSE(noisy, tgt))
    return float(np.mean(vals)), float(np.mean(inputs))


def lbmc_out_stats(iface, batch, base):
    """Output-scale diagnostic for the LBMC collapse basin: the
    lbmc_fmse_s1 plateau (941 ≈ input) showed LOW clamped-SMAPE train
    loss with HIGH train RMSE — a state that fits dark pixels and
    abandons bright ones.  Mean/p99 of output vs target makes that
    dynamic-range compression visible per epoch."""
    import jax.numpy as jnp

    from wcmc_tpu.utils.utils import crop_like

    b = make_view(base, iface.use_llpm_buf)(batch)
    out, _ = iface.validate_batch(b)
    out = np.asarray(out, np.float32)
    tgt = np.asarray(crop_like(b["target_image"], jnp.asarray(out)),
                     np.float32)
    return {"out_mean": round(float(out.mean()), 4),
            "out_p99": round(float(np.percentile(out, 99)), 3),
            "tgt_mean": round(float(tgt.mean()), 4),
            "tgt_p99": round(float(np.percentile(tgt, 99)), 3)}


def sbmc_logit_stats(iface, batch):
    """Kernel-head logit spread on one val batch — the splat-health
    diagnostic: the r4 collapse was a logit spike driving the global
    shift (spread is harmless now that stabilization is per output
    pixel, but a silently exploding head would still show up here)."""
    import jax.numpy as jnp

    params = {k: v.params for k, v in iface.states.items()}
    net_batch = batch
    if iface.use_llpm_buf:
        net_batch, _, _ = iface._augment_features(
            params, batch, slice_recon_only=True)
    _, inter = iface.models["dncnn"].apply(
        {"params": params["dncnn"]}, net_batch,
        capture_intermediates=lambda mdl, _: mdl.name == "kernel_head")
    lg = inter["intermediates"]["kernel_head"]["__call__"][0]
    lg = jnp.asarray(lg).astype(jnp.float32)
    return {"logit_min": round(float(lg.min()), 2),
            "logit_mean": round(float(lg.mean()), 2),
            "logit_max": round(float(lg.max()), 2)}


def run(name, overrides, args, train_corpus, val_batches, seed):
    import jax

    from wcmc_tpu.train.checkpoint import save_checkpoint
    from wcmc_tpu.train.factory import TrainConfig, init_interfaces
    from wcmc_tpu.train.state import get_learning_rate, set_learning_rate

    base = overrides["base_model"]
    cfg = TrainConfig(
        batch_size=args.batch, spp=args.spp,
        lr_pnet=(1e-4,), w_manif=(0.1,),
        finite_check_every=10**9, seed=seed,
        sbmc_ksize=args.ksize,
        warmup_steps=args.warmup,
        **overrides,
    )
    iface = init_interfaces(cfg)[0]
    iface.to_train_mode()
    run_chunk = make_chunk_runner(iface, train_corpus, base)

    tag = f"{name}_s{seed}"
    log_fn = os.path.join(OUT, f"{tag}.jsonl")
    rng = np.random.default_rng(1000 + seed)
    key = jax.random.PRNGKey(seed)
    rows = []
    best_rel = float("inf")
    for epoch in range(args.epochs):
        if base == "lbmc" and epoch and epoch % 3 == 0:
            # reference StepLR(3, 0.5), train_lbmc.py:84-93
            for st in iface.states.values():
                set_learning_rate(
                    st.opt_state, get_learning_rate(st.opt_state) * 0.5)
        t0 = time.time()
        sums, norm = {}, 0
        for c in range(args.chunks_per_epoch):
            ids = np.asarray(
                [train_corpus.sample_coords(rng, args.batch)
                 for _ in range(args.chunk)])
            key = jax.random.fold_in(key, epoch * 10000 + c)
            import jax.numpy as jnp

            iface.states, lds = run_chunk(
                iface.states,
                jnp.asarray(ids[:, 0]), jnp.asarray(ids[:, 1]),
                jnp.asarray(ids[:, 2]), key)
            norm += 1
            for k, v in lds.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        iface.to_eval_mode()
        rel, rel_in = val_relmse(iface, val_batches, base)
        diag = {}
        if base == "sbmc":
            diag = sbmc_logit_stats(
                iface, make_view(base, iface.use_llpm_buf)(val_batches[0]))
        elif base == "lbmc":
            diag = lbmc_out_stats(iface, val_batches[0], base)
        iface.to_train_mode()
        row = {
            **diag,
            "epoch": epoch,
            "steps": (epoch + 1) * args.chunks_per_epoch * args.chunk,
            "val_relmse_1e3": round(rel * 1e3, 4),
            "input_relmse_1e3": round(rel_in * 1e3, 4),
            "sec": round(time.time() - t0, 1),
            **{f"train_{k}": round(v / norm, 6) for k, v in sums.items()},
        }
        rows.append(row)
        with open(log_fn, "a") as f:
            f.write(json.dumps({"config": tag, **row}) + "\n")
        print(f"[{tag}] {row}", flush=True)
        # keep the BEST-val checkpoint, like the shared train loop and
        # the reference's test protocol (its test_models.py evaluates
        # the best model, not the last epoch) — evaluating final-epoch
        # states penalized configs whose curve regressed after its
        # minimum (lbmc_fmse: best 388 at mid-run vs final 550)
        if rel < best_rel:
            best_rel = rel
            save_checkpoint(os.path.join(OUT, f"{tag}.ckpt"), iface,
                            epoch=epoch,
                            extra={"best_val_relmse_1e3":
                                       row["val_relmse_1e3"]})
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_scenes", type=int, default=24)
    ap.add_argument("--val_scenes", type=int, default=6)
    ap.add_argument("--frame", type=int, default=192)
    ap.add_argument("--patch", type=int, default=96)
    ap.add_argument("--ksize", type=int, default=21)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--chunks_per_epoch", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=500)
    ap.add_argument("--lr_dncnn", type=float, default=None,
                    help="override the per-config denoiser lr (the "
                         "reference SBMC 5e-4 collapses to identity "
                         "kernels on the toy corpus; see README)")
    ap.add_argument("--suffix", type=str, default="",
                    help="tag suffix for overridden runs, e.g. _lr1e4")
    ap.add_argument("--seeds", type=int, default=1)
    ap.add_argument("--configs", type=str,
                    default="sbmc,sbmc_fmse,lbmc,lbmc_fmse")
    ap.add_argument("--sbmc_splat", type=str, default="exp",
                    choices=("exp", "softmax"),
                    help="SBMC splat-weight parameterization "
                         "(models/sbmc.py); folded into the run tag so "
                         "softmax-era and exp-era artifacts never collide")
    ap.add_argument("--seed_base", type=int, default=0)
    args = ap.parse_args()

    os.makedirs(OUT, exist_ok=True)
    from wcmc_tpu.data.device_corpus import DeviceCorpus

    print("building corpus (device-side preprocessing)...", flush=True)
    t0 = time.time()
    train_frames = build_frames(args.train_scenes, args.frame, args.spp, 7)
    val_frames = build_frames(args.val_scenes, args.frame, args.spp, 7777)
    train_corpus = DeviceCorpus(train_frames, patch=args.patch)
    del train_frames
    val_corpus = DeviceCorpus(val_frames, patch=args.patch)
    del val_frames
    val_batches = list(val_corpus.grid_batches(args.batch,
                                               stride=args.patch))
    print(f"staged {train_corpus.nbytes() / 1e9:.2f} GB train in "
          f"{time.time() - t0:.0f}s; {len(val_batches)} val batches",
          flush=True)

    summary = []
    for seed in range(args.seed_base, args.seed_base + args.seeds):
        for name in args.configs.split(","):
            overrides = dict(CONFIGS[name])
            if args.lr_dncnn is not None:
                overrides["lr_dncnn"] = args.lr_dncnn
            run_name = name + args.suffix
            if overrides["base_model"] == "sbmc":
                overrides["sbmc_splat"] = args.sbmc_splat
                # weighting folded into the tag: softmax-era and
                # exp-era artifacts can never collide (r4 lesson —
                # the pre-stabilization exp runs are archived under
                # *_expr4_* tags)
                run_name = f"{name}_{args.sbmc_splat}{args.suffix}"
            rows = run(run_name, overrides, args, train_corpus,
                       val_batches, seed)
            best = min(r["val_relmse_1e3"] for r in rows)
            summary.append((run_name, seed, best,
                            rows[-1]["val_relmse_1e3"],
                            rows[-1]["input_relmse_1e3"]))
            print(f"[summary] {run_name} s{seed}: best {best}",
                  flush=True)

    with open(os.path.join(OUT, "summary.csv"), "a") as f:
        if f.tell() == 0:
            f.write("config,seed,best_val_relmse_1e3,final_val_relmse_1e3,"
                    "input_relmse_1e3\n")
        for row in summary:
            f.write(",".join(str(v) for v in row) + "\n")
    print("done", flush=True)


if __name__ == "__main__":
    main()
