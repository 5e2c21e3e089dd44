"""Legacy GAN/EBM entry point — flag surface of the reference's
code/main_train.py:135-202 (which is dead as checked in: its `trainer` module
is missing from the repo, main_train.py:28). This version runs: Flax
Generator/Discriminator (models/gan.py, the models_Mnist.py design) trained by
train/gan_trainer.py with optional Langevin latent refinement."""

from __future__ import annotations

import argparse
import sys


def str2bool(v):
    return str(v).lower() in ("true", "1", "yes")


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--task", type=str, default="train")
    p.add_argument("--content", type=str, default="gan")
    p.add_argument("--dir_work", type=str, default="./")
    p.add_argument("--dir_dataset", type=str, default="/nas2/dataset")
    p.add_argument("--data_name", type=str, default="mnist")
    p.add_argument("--data_set", type=str, default="train")
    p.add_argument("--data_size", type=int, default=32)
    p.add_argument("--data_subset_use", type=str2bool, default=False)
    p.add_argument("--data_subset_label", type=int, default=0)
    p.add_argument("--data_subset_num", type=int, default=0)
    p.add_argument("--date", type=str, default="")
    p.add_argument("--time", type=str, default="")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--num_workers", type=int, default=0)
    p.add_argument("--dim_latent", type=int, default=100)
    p.add_argument("--dim_feature", type=int, default=32)
    p.add_argument("--optim", type=str, default="adam")
    p.add_argument("--lr_scheduler", type=str, default="cosineannealinglr")
    p.add_argument("--lr_generator_max", type=float, default=2e-4)
    p.add_argument("--lr_generator_min", type=float, default=0.0)
    p.add_argument("--lr_discriminator_max", type=float, default=2e-4)
    p.add_argument("--lr_discriminator_min", type=float, default=0.0)
    p.add_argument("--weight_reg", type=float, default=0.0)
    p.add_argument("--langevin_length", type=int, default=0)
    p.add_argument("--langevin_lr", type=float, default=0.0)
    p.add_argument("--langevin_noise_lr", type=float, default=0.0)
    p.add_argument("--epoch_length", type=int, default=100)
    p.add_argument("--epoch_resume", type=int, default=0)
    p.add_argument("--save_every", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from masked_diffusion_tpu.data.datasets import get_dataset
    from masked_diffusion_tpu.train.gan_trainer import GANTrainer
    from masked_diffusion_tpu.utils.dirs import Dir

    dirs = Dir(
        task="train", content=args.content, dir_work=args.dir_work,
        dir_dataset=args.dir_dataset, data_name=args.data_name,
        data_set=args.data_set, data_size=args.data_size,
        date=args.date, time=args.time, method="gan",
    )
    dataset = get_dataset(
        args.dir_dataset, args.data_name, args.data_size, args.data_set,
        data_subset=args.data_subset_use, num_data=args.data_subset_num,
        seed=args.seed,
        # the legacy path trains on a single digit class when subsetting
        # (main_train.py's data_subset_label semantics)
        label_filter=args.data_subset_label if args.data_subset_use else None,
    )
    channels = dataset.shape[-1]
    steps_per_epoch = max(1, dataset.num_batches(args.batch_size))
    trainer = GANTrainer(
        dim_latent=args.dim_latent, dim_features=args.dim_feature,
        out_channels=channels,
        lr_g=args.lr_generator_max, lr_d=args.lr_discriminator_max,
        lr_g_min=args.lr_generator_min, lr_d_min=args.lr_discriminator_min,
        total_steps=steps_per_epoch * args.epoch_length,
        weight_reg=args.weight_reg, langevin_length=args.langevin_length,
        langevin_lr=args.langevin_lr, langevin_noise_lr=args.langevin_noise_lr,
        optim_name=args.optim, seed=args.seed,
    )
    result = trainer.train(
        dataset, args.batch_size, args.epoch_length, seed=args.seed,
        dirs=dirs, sample_every=args.save_every,
    )
    if result["history"]:
        last = result["history"][-1]
        print(f"final losses: G={last['loss_g']:.4f} D={last['loss_d']:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
