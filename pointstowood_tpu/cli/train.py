#!/usr/bin/env python3
"""Train CLI: wood/leaf segmentation model training.

Flag surface matches the reference (reference: pointstowood/train.py:58-76)
plus --wdir (the reference regex-matches the CWD for its working directory,
train.py:25-34; here it is an explicit flag defaulting to '.'). Data layout
is the reference's: labeled PLYs under <wdir>/data/train/ and
<wdir>/data/test/; --preprocess voxelizes them into
<wdir>/data/{train,test}/voxels as .npy tiles that later runs reuse.
"""

import argparse
import datetime
import glob
import os
import resource
import shutil


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--device', type=str, default='tpu',
                        help='accepted for parity; devices come from jax')
    parser.add_argument('--num_procs', type=int, default=1)
    parser.add_argument('--num_epochs', default=2, type=int, metavar='N')
    parser.add_argument('--checkpoint_saves', default=1, type=int, metavar='N')
    parser.add_argument('--model', type=str, default='model.ckpt',
                        help='name of global model [e.g. model.ckpt]')
    parser.add_argument('--resolution', type=float, default=0.01,
                        help='accepted for parity; ignored like the reference')
    parser.add_argument('--grid_size', type=float, nargs='+', default=[2.0, 4.0])
    parser.add_argument('--min_pts', type=int, default=8192)
    parser.add_argument('--max_pts', type=int, default=16384)
    parser.add_argument('--batch_size', type=int, default=2)
    parser.add_argument('--augmentation', action='store_true')
    parser.add_argument('--preprocess', action='store_true')
    parser.add_argument('--test', action='store_true')
    parser.add_argument('--tune', action='store_true')
    parser.add_argument('--stop_early', action='store_true')
    parser.add_argument('--wandb', action='store_true')
    parser.add_argument('--wdir', type=str, default='.',
                        help='working directory containing data/ and model/')
    parser.add_argument('--channels', type=int, default=32,
                        help='backbone width C (reference fixes C=32)')
    parser.add_argument('--dtype', default='bfloat16',
                        choices=['bfloat16', 'float32'],
                        help='activation compute dtype (bfloat16 = AMP-'
                             'equivalent fast path, float32 = exact)')
    parser.add_argument('--verbose', action='store_true')
    return parser.parse_args(argv)


def main(argv=None):
    start = datetime.datetime.now()
    args = parse_args(argv)
    import numpy as np

    from pointstowood_tpu.config import ModelConfig, TilingConfig, TrainConfig
    from pointstowood_tpu.data.tiling import Tile, load_tiles, preprocess_cloud
    from pointstowood_tpu.io import load_file
    from pointstowood_tpu.io.loader import canonicalize_columns
    from pointstowood_tpu.parallel.mesh import data_mesh, maybe_init_distributed
    from pointstowood_tpu.train.trainer import semantic_training
    from pointstowood_tpu.utils.compile_cache import enable_compile_cache

    # multi-host bootstrap (no-op without PTW_COORDINATOR_ADDRESS /
    # PTW_DISTRIBUTED); must precede the first backend touch
    maybe_init_distributed(verbose=args.verbose)
    enable_compile_cache()

    print(f'Mode: train')
    tiling_cfg = TilingConfig(
        grid_size=tuple(args.grid_size), min_pts=args.min_pts,
        max_pts=args.max_pts, resolution=args.resolution,
    )
    train_cfg = TrainConfig(
        num_epochs=args.num_epochs, batch_size=args.batch_size,
        tune=args.tune, augmentation=args.augmentation, test=args.test,
        stop_early=args.stop_early, checkpoint_saves=args.checkpoint_saves,
    )

    checkpoints = np.arange(
        0, args.num_epochs + 1, max(int(args.num_epochs / args.checkpoint_saves), 1)
    )

    # zip + clear old checkpoints (reference train.py:90-94); multi-host:
    # only process 0 touches the (typically shared) filesystem
    import jax as _jax

    old = glob.glob(os.path.join(args.wdir, 'checkpoints/*.ckpt'))
    if old and _jax.process_index() == 0:
        shutil.make_archive(
            os.path.join(args.wdir, 'checkpoints_backup'), 'zip',
            os.path.join(args.wdir, 'checkpoints'),
        )
        for f in old:
            os.remove(f)

    trfile = os.path.join(args.wdir, 'data', 'train', 'voxels')
    tefile = os.path.join(args.wdir, 'data', 'test', 'voxels')

    if args.preprocess:
        if os.path.exists(trfile):
            shutil.rmtree(trfile)
        if args.verbose:
            print('\n----- Preprocessing started -----')
        clouds = glob.glob(os.path.join(args.wdir, 'data/*/*.ply'))
        for p in [w for w in clouds if 'train' in w]:
            pc, _ = load_file(p, additional_headers=True, verbose=True)
            pc, _, _ = canonicalize_columns(pc, mode='train')
            print(f'Voxelising to {list(args.grid_size)} grid sizes')
            preprocess_cloud(pc, tiling_cfg, with_labels=True, vxdir=trfile)
        if args.test:
            if os.path.exists(tefile):
                shutil.rmtree(tefile)
            print('\nTesting')
            for p in [w for w in clouds if 'test' in w]:
                pc, _ = load_file(p, additional_headers=True, verbose=True)
                pc, _, _ = canonicalize_columns(pc, mode='train')
                print(f'Voxelising to {list(args.grid_size)} grid sizes')
                preprocess_cloud(pc, tiling_cfg, with_labels=True, vxdir=tefile)
        if args.verbose:
            rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
            print(f'peak memory: {rss}')
            print(f'runtime: {(datetime.datetime.now() - start).seconds}')

    if args.augmentation:
        print('Training with data augmentation performed on 25% of samples')

    train_tiles = load_tiles(trfile)
    if not train_tiles:
        raise FileNotFoundError(
            f'no tiles found in {trfile}; run with --preprocess and labeled '
            f'PLYs under {args.wdir}/data/train/'
        )
    test_tiles = load_tiles(tefile) if args.test else None
    if args.test and not test_tiles:
        test_tiles = None

    # Data-parallel mesh over all visible devices (None on a single chip);
    # the training engine shards each batch over it and replicates state.
    mesh = data_mesh()
    if mesh is not None:
        print(f'Training data-parallel over {mesh.devices.size} devices')

    if args.verbose:
        print('\n----- Semantic segmentation started -----')
    semantic_training(
        train_tiles, train_cfg,
        ModelConfig(channels=args.channels, compute_dtype=args.dtype), tiling_cfg,
        wdir=args.wdir, model_name=args.model, test_tiles=test_tiles,
        checkpoints=checkpoints.tolist(), use_wandb=args.wandb,
        verbose=args.verbose, mesh=mesh,
    )

    if args.verbose:
        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
        print(f'peak memory: {rss}')
        print(f'runtime: {(datetime.datetime.now() - start).seconds}')


if __name__ == '__main__':
    main()
