"""SBMC training entry point (flag-compatible rebuild of reference
train_sbmc.py; reuses the shared loop from wcmc_tpu.train.loop).

Example (reference train_sbmc.py:218-231):
    python train_sbmc.py --single_gpu --batch_size 8 --val_epoch 1 \
        --data_dir <root> --model_name SBMC_vanilla --desc "SBMC_vanilla" \
        --num_epoch 6 --lr_dncnn 5e-4 --use_sbmc_buf
"""

from __future__ import annotations

import os

import numpy as np

from wcmc_tpu.cli import (
    BasicArgumentParser,
    configure_backend,
    add_common_train_flags,
    add_manifold_flags,
    validate_manifold_flags,
)
from wcmc_tpu.data.dataset import BatchLoader, MSDenoiseDataset, ShuffleLoader
from wcmc_tpu.train.checkpoint import load_checkpoint, restore_interface
from wcmc_tpu.train.factory import sweep_checkpoint_name, TrainConfig, init_interfaces
from wcmc_tpu.train.loop import train

BS_VAL = 4


def init_data(args):
    datasets = {
        "train": MSDenoiseDataset(
            args.data_dir, 8, "sbmc", "train", args.batch_size, "random",
            use_g_buf=args.use_g_buf, use_sbmc_buf=args.use_sbmc_buf,
            use_llpm_buf=args.use_llpm_buf, pnet_out_size=0, seed=args.seed,
            patches_per_image=args.patches_per_image,
            serve_paths_dtype="bfloat16" if args.serve_bf16 else None,
        ),
        "val": MSDenoiseDataset(
            args.data_dir, 8, "sbmc", "val", BS_VAL, "grid",
            use_g_buf=args.use_g_buf, use_sbmc_buf=args.use_sbmc_buf,
            use_llpm_buf=args.use_llpm_buf, pnet_out_size=0, seed=args.seed,
            patches_per_image=(max(args.patches_per_image, BS_VAL)
                               if args.patches_per_image else None),
        ),
    }
    from wcmc_tpu.data.prefetch import DevicePrefetcher

    dataloaders = {
        "train": DevicePrefetcher(
            # cross-image shuffling + threaded image prefetch (the
            # reference shuffles globally via its DataLoader sampler)
            ShuffleLoader(datasets["train"], args.batch_size,
                          seed=args.seed)
        ),
        "val": DevicePrefetcher(BatchLoader(datasets["val"], BS_VAL)),
    }
    return datasets, dataloaders


def make_config(args) -> TrainConfig:
    return TrainConfig(
        base_model="sbmc",
        model_name=args.model_name,
        batch_size=args.batch_size,
        lr_dncnn=args.lr_dncnn,
        lr_pnet=tuple(args.lr_pnet),
        pnet_out_size=tuple(args.pnet_out_size),
        w_manif=tuple(args.w_manif),
        use_g_buf=args.use_g_buf,
        use_sbmc_buf=args.use_sbmc_buf,
        use_llpm_buf=args.use_llpm_buf,
        manif_learn=args.manif_learn,
        manif_loss=args.manif_loss,
        local=args.local,
        manif_pairing=getattr(args, 'manif_pairing', 'roll'),
        disentangle=args.disentangle,
        seed=args.seed,
        compute_dtype=getattr(args, 'compute_dtype', 'bfloat16'),
        sbmc_ksize=getattr(args, "sbmc_ksize", 21),
        sbmc_splat=getattr(args, "sbmc_splat", "exp"),
        warmup_steps=getattr(args, "warmup_steps", 0),
    )


def init_model(dataset, args):
    interfaces = init_interfaces(make_config(args), args)
    for i, iface in enumerate(interfaces):
        fn = sweep_checkpoint_name(args.save, args.model_name, interfaces, i)
        assert args.start_epoch != 0 or not os.path.isfile(fn), (
            f"Model {fn} already exists."
        )
        if args.start_epoch != 0 and os.path.isfile(fn):
            ck = load_checkpoint(fn)
            lr_override = None
            if not args.lr_ckpt:
                lr_override = {
                    name: (args.lr_dncnn if name == "dncnn" else args.lr_pnet[0])
                    for name in iface.states
                }
            restore_interface(iface, ck, lr_override=lr_override)
            if args.best_err is not None:
                iface.best_err = args.best_err
            print("Pretraining weights are loaded.")
        else:
            print("Train models from scratch.")
    if getattr(args, "n_devices", 0) and args.n_devices > 1:
        from wcmc_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=args.n_devices)
        for iface in interfaces:
            iface.to_mesh(mesh)
        print(f"Data parallel over {args.n_devices} devices")
    params = {"plots": {}, "data_device": 0}
    os.makedirs(args.save, exist_ok=True)
    return interfaces, params


def main(args):
    configure_backend()
    np.random.seed(args.seed)
    dataset, dataloaders = init_data(args)
    interfaces, params = init_model(dataset, args)
    train(interfaces, dataloaders, params, args)


if __name__ == "__main__":
    parser = BasicArgumentParser()
    add_common_train_flags(parser)
    parser.add_argument("--use_g_buf", action="store_false")
    parser.add_argument("--lr_dncnn", type=float, default=1e-4,
                        help="learning rate of the SBMC denoiser.")
    parser.add_argument("--use_sbmc_buf", action="store_true",
                        help="use the sbmc-specific buffer.")
    parser.add_argument("--sbmc_ksize", type=int, default=21,
                        help="splatting kernel width (TPU extension).")
    parser.add_argument("--sbmc_splat", type=str, default="exp",
                        choices=("exp", "softmax"),
                        help="splat-weight parameterization: 'exp' is the "
                             "upstream KernelWeighting semantics (per-pixel "
                             "stabilized, firefly rejection); 'softmax' is "
                             "the per-sample-normalized ablation knob "
                             "(collapses to identity on firefly corpora — "
                             "models/sbmc.py).")
    parser.add_argument("--warmup_steps", type=int, default=500,
                        help="linear update warmup (TPU extension; 0 "
                             "restores the reference's cold start — at "
                             "lr 5e-4 that can saturate the output head "
                             "on small corpora, see state.adam_with_clip)")
    add_manifold_flags(parser)
    args = parser.parse_args()
    validate_manifold_flags(args)
    main(args)
