"""Capacity study for the sample-space backbones (SBMC Multisteps and
the LBMC LayerNet redesign) — VERDICT round-1 weak item 8: LayerNet is
a re-design behind the reference interface (upstream NDLE is not
available), so its capacity must be EVIDENCED, not asserted.

Trains each backbone for a few epochs on the synthetic set with a
device-resident batch corpus (same scheme as convergence_experiment)
and reports val RelMSE vs the noisy input. Writes JSONL to
experiments/capacity/.

Usage: python scripts/capacity_study.py [--epochs 6] [--train_batches 16]
"""
import sys, os, json, time, argparse
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DATA = os.environ.get("WCMC_CONV_DATA", "/tmp/wcmc_data/conv16")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "experiments", "capacity")


def collect(n, base, mode, bs, spp, seed=0):
    from wcmc_tpu.data.dataset import BatchLoader, DenoiseDataset

    ds = DenoiseDataset(
        DATA, spp, base_model=base, mode=mode, batch_size=bs,
        sampling="random", use_llpm_buf=False, seed=seed,
        patches_per_image=max(bs, (n * bs) // 16),
    )
    out = []
    for b in BatchLoader(ds, bs):
        out.append(b)
        if len(out) >= n:
            break
    return out


def stage(batches):
    import jax

    return [jax.device_put(b) for b in batches]


def run(base, epochs, n_train, n_val, bs=4, spp=8, seed=0, lr=1e-4):
    import jax.numpy as jnp

    from wcmc_tpu import metrics
    from wcmc_tpu.train.factory import TrainConfig, init_interfaces
    from wcmc_tpu.utils.utils import crop_like

    cfg = TrainConfig(base_model=base, batch_size=bs, spp=spp,
                      lr_dncnn=lr, lr_pnet=(1e-4,),
                      finite_check_every=10**9, seed=seed)
    iface = init_interfaces(cfg)[0]
    t0 = time.time()
    train_b = stage(collect(n_train, base, "train", bs, spp, seed))
    val_b = stage(collect(n_val, base, "val", bs, spp, seed + 1))
    print(f"[{base}] staged {n_train}+{n_val} batches in "
          f"{time.time()-t0:.0f}s", flush=True)

    def val_metrics():
        rels, rel_ins = [], []
        for b in val_b:
            out = iface.validate_batch(b)[0]
            tgt = np.asarray(crop_like(b["target_image"], jnp.asarray(out)))
            noisy = np.asarray(
                crop_like(b["radiance"].mean(axis=1), jnp.asarray(out))
            )
            rels.append(metrics.RelMSE(np.asarray(out), tgt))
            rel_ins.append(metrics.RelMSE(noisy, tgt))
        return float(np.mean(rels)), float(np.mean(rel_ins))

    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(seed)
    iface.to_train_mode()
    log_fn = os.path.join(OUT, f"{base}.jsonl")
    for epoch in range(epochs):
        t0 = time.time()
        for i in rng.permutation(len(train_b)):
            iface.preprocess(train_b[i])
            ld = iface.train_batch(train_b[i])
        iface.to_eval_mode()
        rel, rel_in = val_metrics()
        iface.to_train_mode()
        row = {"config": base, "epoch": epoch,
               "val_relmse_1e3": round(rel * 1e3, 4),
               "input_relmse_1e3": round(rel_in * 1e3, 4),
               "sec": round(time.time() - t0, 1),
               **{f"train_{k}": round(float(v), 6) for k, v in ld.items()}}
        with open(log_fn, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"[{base}] {row}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--train_batches", type=int, default=16)
    ap.add_argument("--val_batches", type=int, default=4)
    ap.add_argument("--models", type=str, default="sbmc,lbmc")
    args = ap.parse_args()
    for base in args.models.split(","):
        # reference learning rates: SBMC lr_dncnn 5e-4
        # (train_sbmc.py:218-226), LBMC 1e-4
        run(base, args.epochs, args.train_batches, args.val_batches,
            lr=5e-4 if base == "sbmc" else 1e-4)


if __name__ == "__main__":
    main()
