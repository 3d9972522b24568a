"""Full-frame evaluation entry point.

Rebuild of reference test_models.py: loads a trained checkpoint,
rebuilds the interface through the train scripts' ``init_model`` (model
family inferred from the model name, reference test_models.py:164-171),
runs tiled full-frame inference over scenes x spp, and writes the
5 x 4 metric grid CSVs + optional figure dumps.

Usage:
    python test_models.py --model_name KPCN_vanilla --save ./weights \
        --data_dir <root> --spps 2 4 8 --scenes bathroom car \
        [--save_figures]
"""

from __future__ import annotations

import argparse
import os

import train_kpcn
import train_lbmc
import train_sbmc
from wcmc_tpu.evaluate import denoise
from wcmc_tpu.train.checkpoint import load_checkpoint, restore_interface


def build_interface(args):
    datasets = {"train": None}  # init_model only reads channel config
    if "SBMC" in args.model_name:
        module, base = train_sbmc, "sbmc"
    elif "LBMC" in args.model_name:
        module, base = train_lbmc, "lbmc"
    elif "KPCN" in args.model_name:
        module, base = train_kpcn, "kpcn"
    else:
        raise ValueError(
            "model_name must contain KPCN, SBMC, or LBMC: "
            f"{args.model_name!r}"
        )
    from wcmc_tpu.train.factory import init_interfaces

    interfaces = init_interfaces(module.make_config(args), args)
    iface = interfaces[0]

    name = args.model_name
    if name.endswith(".ckpt"):
        p_model = os.path.join(args.save, name)
    else:
        p_model = os.path.join(args.save, name + ".ckpt")
    if os.path.isfile(p_model):
        restore_interface(iface, load_checkpoint(p_model))
        print(f"Loaded checkpoint {p_model}")
    else:
        print(f"WARNING: no checkpoint at {p_model}; evaluating random init")
    return iface, base


def main(args):
    from wcmc_tpu.cli import configure_backend

    configure_backend()
    iface, base = build_interface(args)
    input_dir = os.path.join(args.data_dir, "test", "input")
    results = denoise(
        iface,
        input_dir,
        base,
        scenes=args.scenes,
        spps=tuple(args.spps),
        output_dir=args.output_dir,
        use_g_buf=args.use_g_buf,
        use_sbmc_buf=args.use_sbmc_buf,
        use_llpm_buf=args.use_llpm_buf,
        pnet_out_size=args.pnet_out_size[0],
        save_figures=args.save_figures,
        rhf=args.rhf,
        feat_imp=args.feat_imp,
    )
    for (scene, spp), v in sorted(results.items()):
        print(
            f"{scene} @ {spp}spp: RelMSE={v['output']['linear_RelMSE']:.5f} "
            f"(input {v['input']['linear_RelMSE']:.5f}), "
            f"DSSIM={v['output']['gamma22_DSSIM']:.5f}, "
            f"{v['output']['inference_sec']:.2f}s"
        )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name", type=str, required=True)
    parser.add_argument("--save", type=str, default="./weights")
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--output_dir", type=str, default="./eval_out")
    parser.add_argument("--scenes", type=str, nargs="*", default=None)
    parser.add_argument("--spps", type=int, nargs="+", default=[8])
    parser.add_argument("--save_figures", action="store_true")
    parser.add_argument("--rhf", action="store_true",
                        help="export the p-buffer for RHF visualization.")
    parser.add_argument("--feat_imp", action="store_true",
                        help="feature-importance permutation test: shuffle "
                        "path descriptors across positions before inference.")
    # model-config flags (must match training)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--lr_dncnn", type=float, default=1e-4)
    parser.add_argument("--lr_pnet", type=float, nargs="+", default=[1e-4])
    parser.add_argument("--pnet_out_size", type=int, nargs="+", default=[3])
    parser.add_argument("--w_manif", type=float, nargs="+", default=[0.1])
    parser.add_argument("--use_g_buf", action="store_false")
    parser.add_argument("--use_sbmc_buf", action="store_true")
    parser.add_argument("--use_llpm_buf", action="store_true")
    parser.add_argument("--manif_learn", action="store_true")
    parser.add_argument("--manif_loss", type=str, default=None)
    parser.add_argument("--local", action="store_true")
    parser.add_argument("--disentangle", type=str, default="m11r11")
    parser.add_argument("--train_branches", action="store_true")
    parser.add_argument("--kpcn_ref", action="store_true")
    parser.add_argument("--kpcn_pre", action="store_true")
    parser.add_argument("--model_name_contains", type=str, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--compute_dtype", type=str, default="bfloat16")
    # TPU extensions; must match training (make_config reads them)
    parser.add_argument("--kpcn_ksize", type=int, default=21,
                        help="prediction kernel width used at training.")
    parser.add_argument("--sbmc_ksize", type=int, default=21,
                        help="splat kernel width used at training.")
    args = parser.parse_args()
    main(args)
