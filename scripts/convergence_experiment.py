"""Convergence experiment: KPCN vanilla vs KPCN+manifold (FMSE), plus
the roll-vs-permutation pairing A/B (VERDICT round-1 items 5 and 6).

Reference recipe: spp 8, batch 8, 128x128 patches, lr 1e-4, w_manif 0.1
(reference README.md:43-56, train_kpcn.py:358-381), shortened to a
fixed device-resident patch corpus so the axon tunnel's ~6 MB/s bulk
upload (CLAUDE.md) is paid once instead of per step.

Writes per-epoch JSONL to experiments/convergence/<name>.jsonl and a
summary table to experiments/convergence/summary.csv.

Usage:  python scripts/convergence_experiment.py [--epochs 8]
        [--train_batches 40] [--configs vanilla,manifold_roll,...]
"""
import sys, os, json, time, argparse
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DATA = os.environ.get("WCMC_CONV_DATA", "/tmp/wcmc_data/conv16")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "experiments", "convergence")

CONFIGS = {
    "vanilla": dict(use_llpm_buf=False, manif_learn=False, manif_loss=None),
    "manifold_roll": dict(use_llpm_buf=True, manif_learn=True,
                          manif_loss="FMSE", manif_pairing="roll"),
    "manifold_perm": dict(use_llpm_buf=True, manif_learn=True,
                          manif_loss="FMSE", manif_pairing="permutation"),
}


def collect_batches(n, spp, bs, use_llpm, mode, seed=0):
    from wcmc_tpu.data.dataset import BatchLoader, DenoiseDataset

    ds = DenoiseDataset(
        DATA, spp, base_model="kpcn", mode=mode, batch_size=bs,
        sampling="random", use_llpm_buf=use_llpm, seed=seed,
        patches_per_image=max(bs, (n * bs) // 16),
    )
    out = []
    for batch in BatchLoader(ds, bs):
        out.append(batch)
        if len(out) >= n:
            break
    return out


def to_device(batches):
    import jax
    import jax.numpy as jnp

    def cast(k, v):
        v = np.asarray(v)
        # paths dominate batch bytes (151 MB f32 at bs 8 / spp 8); the
        # model consumes them in bf16 anyway — stage them as bf16 to
        # halve the tunnel upload and device residency
        if k == "paths":
            return jnp.asarray(v).astype(jnp.bfloat16)
        return v

    return [jax.device_put({k: cast(k, v) for k, v in b.items()})
            for b in batches]


def val_relmse(iface, val_batches):
    import jax.numpy as jnp

    from wcmc_tpu import metrics
    from wcmc_tpu.utils.utils import crop_like

    vals, inputs = [], []
    for b in val_batches:
        out, _ = iface.validate_batch(b)
        out = np.asarray(out)
        tgt = np.asarray(crop_like(b["target_total"], jnp.asarray(out)))
        noisy = np.asarray(
            crop_like(
                b["kpcn_diffuse_buffer"] * b["kpcn_albedo"]
                + np.expm1(np.asarray(b["kpcn_specular_buffer"])),
                jnp.asarray(out),
            )
        )
        vals.append(metrics.RelMSE(out, tgt))
        inputs.append(metrics.RelMSE(noisy, tgt))
    return float(np.mean(vals)), float(np.mean(inputs))


def run(name, overrides, epochs, n_train, n_val, seed=0, ksize=21):
    import jax

    from wcmc_tpu.train.factory import TrainConfig, init_interfaces

    cfg = TrainConfig(
        base_model="kpcn", batch_size=8, spp=8,
        lr_dncnn=1e-4, lr_pnet=(1e-4,), w_manif=(0.1,),
        train_branches=True, finite_check_every=10**9, seed=seed,
        kpcn_ksize=ksize,
        **overrides,
    )
    iface = init_interfaces(cfg)[0]
    use_llpm = overrides.get("use_llpm_buf", False)

    print(f"[{name}] loading {n_train} train + {n_val} val batches",
          flush=True)
    t0 = time.time()
    train_b = to_device(collect_batches(n_train, 8, 8, use_llpm, "train",
                                        seed))
    val_b = to_device(collect_batches(n_val, 8, 8, use_llpm, "val",
                                      seed + 1))
    print(f"[{name}] staged in {time.time()-t0:.0f}s", flush=True)

    os.makedirs(OUT, exist_ok=True)
    log_fn = os.path.join(OUT, f"{name}.jsonl")
    rows = []
    rng = np.random.default_rng(seed)
    iface.to_train_mode()
    for epoch in range(epochs):
        t0 = time.time()
        order = rng.permutation(len(train_b))
        sums, norm = {}, 0
        for i in order:
            iface.preprocess(train_b[i])
            ld = iface.train_batch(train_b[i])
            norm += 1
            for k, v in ld.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        iface.to_eval_mode()
        rel, rel_in = val_relmse(iface, val_b)
        iface.to_train_mode()
        row = {
            "epoch": epoch,
            "val_relmse_1e3": round(rel * 1e3, 4),
            "input_relmse_1e3": round(rel_in * 1e3, 4),
            "sec": round(time.time() - t0, 1),
            **{f"train_{k}": round(v / norm, 6) for k, v in sums.items()},
        }
        rows.append(row)
        with open(log_fn, "a") as f:
            f.write(json.dumps({"config": name, **row}) + "\n")
        print(f"[{name}] {row}", flush=True)

    from wcmc_tpu.train.checkpoint import save_checkpoint

    ck = os.path.join(OUT, f"{name}.ckpt")
    save_checkpoint(ck, iface, epoch=epochs - 1)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--train_batches", type=int, default=40)
    ap.add_argument("--val_batches", type=int, default=6)
    ap.add_argument("--ksize", type=int, default=21)
    ap.add_argument("--configs", type=str,
                    default="vanilla,manifold_roll,manifold_perm")
    args = ap.parse_args()

    summary = {}
    for name in args.configs.split(","):
        summary[name] = run(name, CONFIGS[name], args.epochs,
                            args.train_batches, args.val_batches,
                            ksize=args.ksize)

    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "summary.csv"), "a") as f:
        f.write("config,epoch,val_relmse_1e3,input_relmse_1e3\n")
        for name, rows in summary.items():
            for r in rows:
                f.write(f"{name},{r['epoch']},{r['val_relmse_1e3']},"
                        f"{r['input_relmse_1e3']}\n")
    print("summary written", flush=True)


if __name__ == "__main__":
    main()
