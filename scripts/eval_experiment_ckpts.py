"""Full-frame evaluation of experiment checkpoints on held-out scenes.

Walks experiments/{manifold,sample_space}/*.ckpt, rebuilds the
matching interface, restores the weights, and runs the standard
full-frame eval harness (evaluate.denoise: tiled inference, 28-px
boundary crop, has_hit passthrough, 5x4 metric grid) over the on-disk
synthetic test set at the requested spps.  CSVs land next to the
checkpoints in experiments/<dir>/eval/.

Usage:
    python scripts/make_disk_corpus.py            # once
    python scripts/eval_experiment_ckpts.py [--spps 4,8] [--glob sbmc]
"""
import sys, os, glob, json, argparse
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.environ.get("WCMC_R3_DATA", "/tmp/wcmc_data/r3corpus")

# tag prefix -> TrainConfig overrides (mirrors the experiment runners)
KPCN_CONFIGS = {
    "vanilla": dict(use_llpm_buf=False, manif_learn=False, manif_loss=None),
    "fmse": dict(use_llpm_buf=True, manif_learn=True, manif_loss="FMSE"),
    "grs": dict(use_llpm_buf=True, manif_learn=True, manif_loss="GRS"),
    "m10r01": dict(use_llpm_buf=True, manif_learn=True, manif_loss="FMSE",
                   disentangle="m10r01", pnet_out_size=(4,)),
    "kpcn_ref": dict(use_llpm_buf=False, manif_learn=False, manif_loss=None,
                     kpcn_ref=True),
    "kpcn_pre": dict(use_llpm_buf=True, manif_learn=False, manif_loss=None,
                     kpcn_pre=True),
}
SS_CONFIGS = {
    # Legacy plain sbmc tags (sbmc_s0, sbmc_lr1e4_s0, ...) are the r3/r4
    # SOFTMAX-era runs: the weighting must be pinned or a rerun would
    # silently evaluate softmax-trained kernel heads through the exp
    # parameterization (params restore succeeds either way).  Runs from
    # the r5 runner fold the weighting into the tag (sbmc_exp_*,
    # sbmc_softmax_*).  The r4 pre-stabilization exp artifacts are
    # archived under *_expr4_* and are NOT re-evaluable: the global-
    # shift parameterization they were trained under was removed
    # (ops/splat.py::splat_normalized_logits) — their committed CSVs
    # are frozen.
    "sbmc": dict(base_model="sbmc", use_llpm_buf=False, manif_learn=False,
                 manif_loss=None, sbmc_splat="softmax"),
    "sbmc_fmse": dict(base_model="sbmc", use_llpm_buf=True, manif_learn=True,
                      manif_loss="FMSE", sbmc_splat="softmax"),
    "sbmc_exp": dict(base_model="sbmc", use_llpm_buf=False,
                     manif_learn=False, manif_loss=None, sbmc_splat="exp"),
    "sbmc_fmse_exp": dict(base_model="sbmc", use_llpm_buf=True,
                          manif_learn=True, manif_loss="FMSE",
                          sbmc_splat="exp"),
    "sbmc_softmax": dict(base_model="sbmc", use_llpm_buf=False,
                         manif_learn=False, manif_loss=None,
                         sbmc_splat="softmax"),
    "sbmc_fmse_softmax": dict(base_model="sbmc", use_llpm_buf=True,
                              manif_learn=True, manif_loss="FMSE",
                              sbmc_splat="softmax"),
    "lbmc": dict(base_model="lbmc", use_llpm_buf=False, manif_learn=False,
                 manif_loss=None),
    "lbmc_fmse": dict(base_model="lbmc", use_llpm_buf=True, manif_learn=True,
                      manif_loss="FMSE"),
    "lbmc_buf": dict(base_model="lbmc", use_llpm_buf=True, manif_learn=False,
                     manif_loss=None),
}


def config_for(tag):
    """'<name>[_<suffix>]_s<seed>.ckpt' -> (overrides, base_model).

    Longest-prefix match so suffixed reruns (e.g. sbmc_lr1e4_s0 from
    the runner's --suffix flag) resolve to their base config."""
    name = tag.rsplit("_s", 1)[0]
    if "_expr4" in name:
        # r4 pre-stabilization exp checkpoints: their parameterization
        # no longer exists in the code — frozen, never re-evaluated
        return None
    for table, extra in ((KPCN_CONFIGS, {"base_model": "kpcn"}),
                         (SS_CONFIGS, {})):
        for key in sorted(table, key=len, reverse=True):
            if name == key or name.startswith(key + "_"):
                return dict(table[key], **extra)
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spps", type=str, default="4,8")
    ap.add_argument("--glob", type=str, default="")
    ap.add_argument("--dirs", type=str, default="manifold,sample_space")
    args = ap.parse_args()
    spps = tuple(int(s) for s in args.spps.split(","))

    from wcmc_tpu import evaluate
    from wcmc_tpu.train.checkpoint import load_checkpoint, restore_interface
    from wcmc_tpu.train.factory import TrainConfig, init_interfaces

    assert os.path.isdir(os.path.join(DATA, "test", "input")), (
        f"{DATA}: run scripts/make_disk_corpus.py first")

    for d in args.dirs.split(","):
        for ck_fn in sorted(glob.glob(
                os.path.join(ROOT, "experiments", d, "*.ckpt"))):
            tag = os.path.basename(ck_fn)[:-5]
            if args.glob and args.glob not in tag:
                continue
            overrides = config_for(tag)
            if overrides is None:
                print(f"skip {tag}: unknown config", flush=True)
                continue
            out_dir = os.path.join(ROOT, "experiments", d, "eval", tag)
            if os.path.isfile(os.path.join(out_dir,
                                           f"results_{spps[-1]}.csv")):
                print(f"skip {tag}: already evaluated", flush=True)
                continue
            base = overrides.pop("base_model")
            cfg = TrainConfig(base_model=base, finite_check_every=10**9,
                              **overrides)
            iface = init_interfaces(cfg)[0]
            # params only: eval never steps the optimizer, and the
            # experiment runners' warmup/StepLR wrappers change the
            # opt-state tree arity vs the plain CLI build
            ck = load_checkpoint(ck_fn)
            restore_interface(iface, ck, load_optim=False)
            # surface WHICH state this CSV describes (ADVICE r4: a
            # two-stage config's best snapshot may predate the
            # fine-tune stage; the runners stamp it into the ckpt)
            meta = {"tag": tag,
                    "best_epoch": ck.get("start_epoch", 0) - 1,
                    "best_stage": ck.get("best_stage"),
                    "best_val_relmse_1e3": ck.get("best_val_relmse_1e3")}
            os.makedirs(os.path.join(ROOT, "experiments", d, "eval", tag),
                        exist_ok=True)
            with open(os.path.join(ROOT, "experiments", d, "eval", tag,
                                   "ckpt_meta.json"), "w") as f:
                json.dump(meta, f)
            print(f"evaluating {tag} ({base}) at spp {spps} "
                  f"[ckpt: {meta}]", flush=True)
            res = evaluate.denoise(
                iface, os.path.join(DATA, "test", "input"), base,
                spps=spps, output_dir=out_dir,
                use_llpm_buf=cfg.use_llpm_buf,
            )
            for (scene, spp), v in sorted(res.items()):
                print(f"  {tag} {scene}@{spp}: RelMSE "
                      f"{v['output']['linear_RelMSE']:.6f} "
                      f"(input {v['input']['linear_RelMSE']:.6f})",
                      flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
