"""Round-3 convergence experiment: does manifold learning separate?

Fixes the round-2 methodology flaw (a fixed device-resident patch
corpus that every config overfits): full 256-px frames are staged on
device ONCE and fresh random 128-px patches are cut on device every
step (wcmc_tpu/data/device_corpus.py), so no patch repeats and the
only shared state between configs is the scene set.

Reference recipe mirrored (reference README.md:43-56,
train_kpcn.py:358-381): spp 8, batch 8, 128-px patches, lr 1e-4,
w_manif 0.1, stage 2 fine-tune at lr 1e-6. Configs: vanilla KPCN,
KPCN+FMSE manifold, KPCN+GRS manifold, each over ``--seeds`` seeds.

Steps are chained through ``lax.scan`` in chunks so the ~35 ms axon
dispatch latency amortizes across a whole chunk (one host call per 32
steps instead of per step).

Writes per-epoch JSONL to experiments/manifold/<name>_s<seed>.jsonl,
checkpoints, and a run summary CSV.
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
                   "experiments", "manifold")

CONFIGS = {
    "vanilla": dict(use_llpm_buf=False, manif_learn=False, manif_loss=None),
    "fmse": dict(use_llpm_buf=True, manif_learn=True, manif_loss="FMSE"),
    "grs": dict(use_llpm_buf=True, manif_learn=True, manif_loss="GRS"),
    # ablation surface (reference interfaces.py:526-750)
    "m10r01": dict(use_llpm_buf=True, manif_learn=True, manif_loss="FMSE",
                   disentangle="m10r01", pnet_out_size=(4,)),
    "kpcn_ref": dict(use_llpm_buf=False, manif_learn=False, manif_loss=None,
                     kpcn_ref=True),
    # two-phase: run() trains manifold-only then frozen-backbone KPCN
    "kpcn_pre": dict(use_llpm_buf=True, manif_learn=True, manif_loss="FMSE",
                     kpcn_pre=True),
    # gradient-parity sweep (VERDICT r4 item 7): at the reference
    # w_manif 0.1 the manifold term carries 0.03-0.5% of the PathNet
    # gradient norm (the r4 grad-share diagnostic) — too small to
    # steer. These give the loss an actual vote; upstream treats
    # w_manif as a sweep flag too (reference train_kpcn.py:390-396).
    "fmse_w1": dict(use_llpm_buf=True, manif_learn=True, manif_loss="FMSE",
                    w_manif=(1.0,)),
    "fmse_w10": dict(use_llpm_buf=True, manif_learn=True, manif_loss="FMSE",
                     w_manif=(10.0,)),
    "fmse_w100": dict(use_llpm_buf=True, manif_learn=True,
                      manif_loss="FMSE", w_manif=(100.0,)),
}


def build_frames(n_scenes, size, spp, seed, use_llpm):
    """Synthetic scenes -> full-frame KPCN batch dicts, preprocessed
    ON DEVICE: the host only generates the raw dump (~4 s/scene on
    this one-core box) and ships it once (~27 MB); the jax feature
    pipeline (batches.kpcn_batch_from_raw) runs on the chip and the
    result stays device-resident in its staging dtype — host-side
    preprocessing was 18 s/scene and was the staging bottleneck."""
    import functools

    import jax

    from wcmc_tpu.data import synthetic
    from wcmc_tpu.data.batches import kpcn_batch_from_raw

    @functools.partial(jax.jit, donate_argnums=(0,))
    def prep(raw, gt):
        f = kpcn_batch_from_raw(raw, gt, use_llpm_buf=use_llpm)
        return {k: bf16_cast(k, v) for k, v in f.items()}

    frames = []
    rng = np.random.default_rng(seed)
    for i in range(n_scenes):
        raw, gt = synthetic.synthetic_raw_sample(rng, size, size, spp)
        frames.append(prep(raw, gt))
        if (i + 1) % 8 == 0:
            print(f"  built {i + 1}/{n_scenes} scenes", flush=True)
    return frames


def bf16_cast(k, v):
    import jax.numpy as jnp

    # per-sample tensors dominate staging bytes; the models consume
    # them in bf16 anyway
    if k in ("paths", "radiance", "features"):
        return v.astype(jnp.bfloat16)
    return v


def stage(frames, patch, val_frac=0.0):
    from wcmc_tpu.data.device_corpus import DeviceCorpus

    return DeviceCorpus(frames, patch=patch, cast=bf16_cast)


def strip_llpm(batch):
    """Shared corpus -> vanilla view: drop the paths tensor and the
    path-weight channel (the last channel batches.kpcn_batch_from_raw
    appends under use_llpm_buf)."""
    batch = dict(batch)
    if "paths" in batch:
        del batch["paths"]
        batch["kpcn_diffuse_in"] = batch["kpcn_diffuse_in"][..., :-1]
        batch["kpcn_specular_in"] = batch["kpcn_specular_in"][..., :-1]
    return batch


def make_chunk_runner(iface, corpus, chunk):
    """One jitted call: scan `chunk` train steps over freshly-cropped
    device patches."""
    import jax
    import jax.numpy as jnp

    from wcmc_tpu.data.device_corpus import _crop_frames

    from wcmc_tpu.train import interfaces as itf

    raw_step = iface._make_train_step()
    patch = corpus.patch
    strip = not iface.use_llpm_buf
    # KPCNRef applies its target-concat in train_batch, which the scan
    # bypasses — apply it in the body
    augment = (iface._augment
               if isinstance(iface, itf.KPCNRefInterface) else None)

    # frames MUST be a jit argument, not a closure: captured device
    # arrays lower to HLO constants and the ~2.4 GB program broke the
    # axon remote-compile tunnel (r4: 40 min, then Broken pipe)
    @jax.jit
    def run_chunk(states, frames, ids, ys, xs, key):
        def body(states, inp):
            i, y, x, j = inp
            batch = _crop_frames(frames, i, y, x, patch)
            if strip:
                batch = strip_llpm(batch)
            if augment is not None:
                batch = augment(batch)
            states, ld = raw_step(states, batch, jax.random.fold_in(key, j))
            return states, ld

        steps = jnp.arange(ids.shape[0])
        states, lds = jax.lax.scan(body, states, (ids, ys, xs, steps))
        return states, jax.tree_util.tree_map(
            lambda v: jnp.mean(v.astype(jnp.float32)), lds)

    def call(states, ids, ys, xs, key):
        return run_chunk(states, corpus.frames, ids, ys, xs, key)

    return call


def make_grad_share_diag(iface):
    """Per-epoch diagnostic (VERDICT r3 weak #5): the manifold term's
    share of the PathNet gradient norm.  Distinguishes a genuine null
    result ("manifold gradients flow but don't help") from a no-op
    loss ("w_manif*L_manif is ~1e4x smaller than recon and never
    steers the embedding").  share = |g_manif| / (|g_manif|+|g_recon|)
    over the PathNet parameters only."""
    import jax
    import jax.numpy as jnp

    from wcmc_tpu.train.interfaces import crop_hw
    from wcmc_tpu.utils.utils import crop_like

    lf = iface.loss_funcs
    pnet_names = [n for n in iface.models if n != "dncnn"]

    def losses(params, batch, key):
        net_batch, out_manif = iface._forward_with_paths(params, batch)
        out = iface.models["dncnn"].apply(
            {"params": params["dncnn"]}, net_batch)
        diffuse, specular = out["diffuse"], out["specular"]
        tgt_d = crop_like(batch["target_diffuse"], diffuse)
        tgt_s = crop_like(batch["target_specular"], specular)
        l_recon = (lf["l_diffuse"](diffuse, tgt_d)
                   + lf["l_specular"](specular, tgt_s))
        kd, ks = jax.random.split(key)
        h_t, w_t = diffuse.shape[1], diffuse.shape[2]
        l_manif = iface.w_manif * (
            lf["l_manif"](kd, crop_hw(out_manif["diffuse"], h_t, w_t),
                          tgt_d, cmajor=True)
            + lf["l_manif"](ks, crop_hw(out_manif["specular"], h_t, w_t),
                            tgt_s, cmajor=True))
        return l_recon, l_manif

    @jax.jit
    def diag(states, batch, key):
        params = {n: states[n].params for n in states}
        g_r = jax.grad(lambda p: losses(p, batch, key)[0])(params)
        g_m = jax.grad(lambda p: losses(p, batch, key)[1])(params)

        def pnorm(g):
            sq = 0.0
            for n in pnet_names:
                for leaf in jax.tree_util.tree_leaves(g[n]):
                    sq = sq + jnp.sum(leaf.astype(jnp.float32) ** 2)
            return jnp.sqrt(sq)

        nr, nm = pnorm(g_r), pnorm(g_m)
        return nm / (nm + nr + 1e-30), nm, nr

    return diag


def val_relmse(iface, val_batches):
    import jax.numpy as jnp

    from wcmc_tpu import metrics
    from wcmc_tpu.utils.utils import crop_like

    vals, inputs = [], []
    for b in val_batches:
        if not iface.use_llpm_buf:
            b = strip_llpm(b)
        out, _ = iface.validate_batch(b)
        out = np.asarray(out)
        tgt = np.asarray(crop_like(b["target_total"], jnp.asarray(out)))
        noisy = np.asarray(
            crop_like(
                jnp.asarray(b["kpcn_diffuse_buffer"], jnp.float32)
                * jnp.asarray(b["kpcn_albedo"], jnp.float32)
                + jnp.expm1(jnp.asarray(b["kpcn_specular_buffer"],
                                        jnp.float32)),
                jnp.asarray(out),
            )
        )
        vals.append(metrics.RelMSE(out, tgt))
        inputs.append(metrics.RelMSE(noisy, tgt))
    return float(np.mean(vals)), float(np.mean(inputs))


def _train_epochs(iface, run_chunk, corpus, args, epochs, val_batches,
                  tag, log_fn, rng, key, stage_name, step0=0, diag=None,
                  best_ckpt_fn=None):
    """Shared epoch loop: chunks of scanned steps + per-epoch val.
    With ``best_ckpt_fn``, snapshots the best-val state there."""
    import jax
    import jax.numpy as jnp

    from wcmc_tpu.train.checkpoint import save_checkpoint

    rows = []
    best_rel = float("inf")
    for epoch in range(epochs):
        t0 = time.time()
        sums, norm = {}, 0
        for c in range(args.chunks_per_epoch):
            coords = np.stack(
                [corpus.sample_coords(rng, args.batch) for _ in range(args.chunk)])
            key = jax.random.fold_in(key, hash(stage_name) % 997 * 100000
                                     + epoch * 1000 + c)
            iface.states, lds = run_chunk(
                iface.states, jnp.asarray(coords[:, 0]),
                jnp.asarray(coords[:, 1]), jnp.asarray(coords[:, 2]), key)
            norm += 1
            for k, v in lds.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        iface.to_eval_mode()
        rel, rel_in = val_relmse(iface, val_batches)
        iface.to_train_mode()
        row = {
            "epoch": epoch, "stage": stage_name,
            "steps": step0 + (epoch + 1) * args.chunks_per_epoch * args.chunk,
            "val_relmse_1e3": round(rel * 1e3, 4),
            "input_relmse_1e3": round(rel_in * 1e3, 4),
            "sec": round(time.time() - t0, 1),
            **{f"train_{k}": round(v / norm, 6) for k, v in sums.items()},
        }
        if diag is not None:
            share, nm, nr = diag(iface.states, val_batches[0],
                                 jax.random.fold_in(key, 555))
            row["manif_grad_share"] = round(float(share), 6)
            row["manif_grad_norm"] = round(float(nm), 6)
            row["recon_grad_norm"] = round(float(nr), 6)
        rows.append(row)
        with open(log_fn, "a") as f:
            f.write(json.dumps({"config": tag, **row}) + "\n")
        print(f"[{tag}] {row}", flush=True)
        if best_ckpt_fn is not None and rel < best_rel:
            best_rel = rel
            # the winning epoch/stage rides in the checkpoint so the
            # eval sweep can surface WHICH state a CSV describes
            # (two-stage configs: a "best" snapshot may predate the
            # fine-tune stage — ADVICE r4)
            save_checkpoint(best_ckpt_fn, iface, epoch=epoch,
                            extra={"best_stage": stage_name,
                                   "best_val_relmse_1e3":
                                       row["val_relmse_1e3"]})
    return rows


def run_kpcn_pre(args, train_corpus, val_batches, seed):
    """Two-phase KPCNPre schedule (reference interfaces.py:588-750):
    (a) pre-train the PathNets alone under the manifold loss; (b)
    train KPCN under the frozen pre-trained PathNets."""
    import jax

    from wcmc_tpu.train.checkpoint import save_checkpoint
    from wcmc_tpu.train.factory import TrainConfig, init_interfaces

    common = dict(base_model="kpcn", batch_size=args.batch, spp=8, lr_dncnn=1e-4,
                  lr_pnet=(1e-4,), w_manif=(0.1,), train_branches=True,
                  finite_check_every=10**9, seed=seed,
                  kpcn_ksize=args.ksize, kpcn_pre=True, use_llpm_buf=True)
    tag = f"kpcn_pre_s{seed}"
    log_fn = os.path.join(OUT, f"{tag}.jsonl")
    rng = np.random.default_rng(1000 + seed)
    key = jax.random.PRNGKey(seed)
    epochs_a = max(2, args.epochs // 2)
    epochs_b = max(2, args.epochs - epochs_a)

    cfg_a = TrainConfig(manif_learn=True, manif_loss="FMSE", **common)
    iface = init_interfaces(cfg_a)[0]
    iface.to_train_mode()
    run_chunk = make_chunk_runner(iface, train_corpus, args.chunk)
    _train_epochs(iface, run_chunk, train_corpus, args, epochs_a,
                  val_batches, tag, log_fn, rng, key, "pretrain",
                  diag=make_grad_share_diag(iface))

    cfg_b = TrainConfig(manif_learn=False, manif_loss=None, **common)
    iface_b = init_interfaces(cfg_b)[0]
    iface_b.states = {
        n: iface_b.states[n].replace(params=iface.states[n].params)
        for n in iface_b.states
    }
    iface_b.to_train_mode()
    run_chunk_b = make_chunk_runner(iface_b, train_corpus, args.chunk)
    rows = _train_epochs(iface_b, run_chunk_b, train_corpus, args,
                         epochs_b, val_batches, tag, log_fn, rng, key,
                         "frozen",
                         step0=epochs_a * args.chunks_per_epoch * args.chunk,
                         best_ckpt_fn=os.path.join(OUT, f"{tag}.ckpt"))
    return rows


def run(name, overrides, args, train_corpus, val_batches, seed):
    import jax

    from wcmc_tpu.train.checkpoint import save_checkpoint
    from wcmc_tpu.train.factory import TrainConfig, init_interfaces
    from wcmc_tpu.train.state import set_learning_rate

    if overrides.get("kpcn_pre"):
        return run_kpcn_pre(args, train_corpus, val_batches, seed)

    kw = dict(
        base_model="kpcn", batch_size=args.batch, spp=8,
        lr_dncnn=1e-4, lr_pnet=(1e-4,), w_manif=(0.1,),
        train_branches=True, finite_check_every=10**9, seed=seed,
        kpcn_ksize=args.ksize,
    )
    kw.update(overrides)
    cfg = TrainConfig(**kw)
    iface = init_interfaces(cfg)[0]
    iface.to_train_mode()
    run_chunk = make_chunk_runner(iface, train_corpus, args.chunk)
    diag = make_grad_share_diag(iface) if cfg.manif_learn else None

    tag = f"{name}_s{seed}"
    log_fn = os.path.join(OUT, f"{tag}.jsonl")
    rng = np.random.default_rng(1000 + seed)
    key = jax.random.PRNGKey(seed)
    rows = []
    best_rel = float("inf")
    total_epochs = args.epochs + args.finetune_epochs
    for epoch in range(total_epochs):
        if epoch == args.epochs:   # stage 2: fine-tune (reference
            # train_kpcn.py:370-381 restarts at lr 1e-6)
            for st in iface.states.values():
                set_learning_rate(st.opt_state, 1e-6)
        t0 = time.time()
        sums, norm = {}, 0
        for c in range(args.chunks_per_epoch):
            ids = np.empty((args.chunk, args.batch), np.int32)
            ys = np.empty((args.chunk, args.batch), np.int32)
            xs = np.empty((args.chunk, args.batch), np.int32)
            for s in range(args.chunk):
                ids[s] = rng.integers(0, train_corpus.n, args.batch)
                ys[s] = rng.integers(0, train_corpus.max_y + 1, args.batch)
                xs[s] = rng.integers(0, train_corpus.max_x + 1, args.batch)
            import jax.numpy as jnp

            key = jax.random.fold_in(key, epoch * 10000 + c)
            iface.states, lds = run_chunk(
                iface.states, jnp.asarray(ids), jnp.asarray(ys),
                jnp.asarray(xs), key)
            norm += 1
            for k, v in lds.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        iface.to_eval_mode()
        rel, rel_in = val_relmse(iface, val_batches)
        iface.to_train_mode()
        row = {
            "epoch": epoch,
            "stage": 2 if epoch >= args.epochs else 1,
            "steps": (epoch + 1) * args.chunks_per_epoch * args.chunk,
            "val_relmse_1e3": round(rel * 1e3, 4),
            "input_relmse_1e3": round(rel_in * 1e3, 4),
            "sec": round(time.time() - t0, 1),
            **{f"train_{k}": round(v / norm, 6) for k, v in sums.items()},
        }
        if diag is not None:
            share, nm, nr = diag(iface.states, val_batches[0],
                                 jax.random.fold_in(key, 555))
            row["manif_grad_share"] = round(float(share), 6)
            row["manif_grad_norm"] = round(float(nm), 6)
            row["recon_grad_norm"] = round(float(nr), 6)
        rows.append(row)
        with open(log_fn, "a") as f:
            f.write(json.dumps({"config": tag, **row}) + "\n")
        print(f"[{tag}] {row}", flush=True)
        # BEST-val checkpoint, matching the shared train loop and the
        # reference test protocol (test_models.py evaluates the best
        # model).  Final-epoch snapshots made the full-frame eval
        # measure how far a run had regressed past its minimum
        # (grs_s0: best 8.5 vs final 157.8 val RelMSE x1e3).
        if rel < best_rel:
            best_rel = rel
            save_checkpoint(os.path.join(OUT, f"{tag}.ckpt"), iface,
                            epoch=epoch,
                            extra={"best_stage": row["stage"],
                                   "best_val_relmse_1e3":
                                       row["val_relmse_1e3"]})
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_scenes", type=int, default=40)
    ap.add_argument("--val_scenes", type=int, default=8)
    ap.add_argument("--frame", type=int, default=256)
    ap.add_argument("--patch", type=int, default=128)
    ap.add_argument("--ksize", type=int, default=21)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--finetune_epochs", type=int, default=2)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--chunks_per_epoch", type=int, default=8)
    ap.add_argument("--seeds", type=int, default=1)
    ap.add_argument("--seed_start", type=int, default=0,
                    help="first seed to run (fill single-seed holes "
                         "without redoing seed 0)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--configs", type=str, default="vanilla,fmse,grs")
    args = ap.parse_args()

    os.makedirs(OUT, exist_ok=True)
    names = args.configs.split(",")
    any_llpm = any(CONFIGS[n]["use_llpm_buf"] for n in names)

    # one scene set for every config/seed; llpm keys present iff needed
    print("building corpus frames on host...", flush=True)
    t0 = time.time()
    train_frames = build_frames(args.train_scenes, args.frame, args.spp,
                                seed=7, use_llpm=any_llpm)
    val_frames = build_frames(args.val_scenes, args.frame, args.spp,
                              seed=7777, use_llpm=any_llpm)
    print(f"built in {time.time() - t0:.0f}s; staging to device...",
          flush=True)

    t0 = time.time()
    train_corpus = stage(train_frames, args.patch)
    del train_frames
    val_corpus = stage(val_frames, args.patch)
    del val_frames
    val_batches = list(val_corpus.grid_batches(args.batch, stride=args.patch))
    print(f"staged {train_corpus.nbytes() / 1e9:.2f} GB train + "
          f"{val_corpus.nbytes() / 1e9:.2f} GB val in "
          f"{time.time() - t0:.0f}s; {len(val_batches)} val batches",
          flush=True)

    summary = []
    for seed in range(args.seed_start, args.seeds):
        for name in names:
            rows = run(name, CONFIGS[name], args, train_corpus,
                       val_batches, seed)
            best = min(r["val_relmse_1e3"] for r in rows)
            final = rows[-1]["val_relmse_1e3"]
            summary.append((name, seed, best, final,
                            rows[-1]["input_relmse_1e3"]))
            print(f"[summary] {name} s{seed}: best {best} final {final}",
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
