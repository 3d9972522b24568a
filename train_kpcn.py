"""KPCN training entry point.

Flag-compatible rebuild of reference train_kpcn.py (see
``python train_kpcn.py --help``; example invocations mirror
reference train_kpcn.py:357-381):

KPCN vanilla:
    python train_kpcn.py --single_gpu --batch_size 8 --val_epoch 1 \
        --data_dir <root> --model_name KPCN_vanilla --desc "KPCN vanilla" \
        --num_epoch 8 --lr_dncnn 1e-4 --train_branches

KPCN manifold:
    python train_kpcn.py --single_gpu --batch_size 8 --val_epoch 1 \
        --data_dir <root> --model_name KPCN_manifold_FMSE --desc "..." \
        --num_epoch 8 --manif_loss FMSE --lr_dncnn 1e-4 --lr_pnet 1e-4 \
        --use_llpm_buf --manif_learn --w_manif 0.1 --train_branches
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

BS_VAL = 4  # validation batch size (reference train_kpcn.py:383)


def init_data(args):
    datasets = {
        "train": MSDenoiseDataset(
            args.data_dir, 8, "kpcn", "train", args.batch_size, "random",
            use_g_buf=True, use_sbmc_buf=False,
            use_llpm_buf=args.use_llpm_buf, pnet_out_size=3, seed=args.seed,
            patches_per_image=args.patches_per_image,
            serve_paths_dtype="bfloat16" if args.serve_bf16 else None,
        ),
        "val": MSDenoiseDataset(
            args.data_dir, 8, "kpcn", "val", BS_VAL, "grid",
            use_g_buf=True, use_sbmc_buf=False,
            use_llpm_buf=args.use_llpm_buf, pnet_out_size=3, seed=args.seed,
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
        base_model="kpcn",
        model_name=args.model_name,
        batch_size=args.batch_size,
        lr_dncnn=args.lr_dncnn,
        lr_pnet=tuple(args.lr_pnet),
        pnet_out_size=tuple(args.pnet_out_size),
        w_manif=tuple(args.w_manif),
        use_llpm_buf=args.use_llpm_buf,
        manif_learn=args.manif_learn,
        manif_loss=args.manif_loss,
        local=args.local,
        manif_pairing=getattr(args, 'manif_pairing', 'roll'),
        disentangle=args.disentangle,
        train_branches=args.train_branches,
        kpcn_ref=args.kpcn_ref,
        kpcn_pre=args.kpcn_pre,
        seed=args.seed,
        compute_dtype=getattr(args, 'compute_dtype', 'bfloat16'),
        kpcn_ksize=getattr(args, "kpcn_ksize", 21),
    )


def init_model(dataset, args):
    """Build interfaces (+resume from checkpoint when --start_epoch > 0).

    Name/shape kept from the reference (train_kpcn.py:192-341) so
    test_models.py can reuse it.
    """
    interfaces = init_interfaces(make_config(args), args)
    grid = len(interfaces)
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
    parser.add_argument("--lr_dncnn", type=float, default=1e-4,
                        help="learning rate of KPCN.")
    add_manifold_flags(parser)
    parser.add_argument("--train_branches", action="store_true",
                        help="train the diffuse and specular branches independently.")
    parser.add_argument("--kpcn_ref", action="store_true",
                        help="train KPCN-Ref model.")
    parser.add_argument("--kpcn_pre", action="store_true",
                        help="train KPCN-Pre model.")
    parser.add_argument("--kpcn_ksize", type=int, default=21,
                        help="prediction kernel width (TPU extension).")
    args = parser.parse_args()
    validate_manifold_flags(args)
    main(args)
