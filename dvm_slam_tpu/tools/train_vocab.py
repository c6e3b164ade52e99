#!/usr/bin/env python
"""Train the shipped default vocabulary (data/voc_default.npz).

The reference ships a 10^6-word ORBvoc.txt trained offline on generic image
corpora (`orb_slam3/Vocabulary/`, a missing large blob). This trains our
binary tree on ORB descriptors extracted by THIS framework's front end from
a mix of textured worlds (procedural multi-octave noise across seeds, plus a
real photograph) — 10^4 words by default (branch 10, depth 4).

Usage: python -m dvm_slam_tpu.tools.train_vocab [out.npz] [--words 10000]
"""

import argparse
import os
import sys

import numpy as np


def collect_descriptors(n_target=120_000, seed=0):
    import jax
    import jax.numpy as jnp

    from ..frontend.extractor import FrontendConfig, make_frame
    from ..io import synthetic

    fc = FrontendConfig(height=240, width=320, n_features=600)
    K = jnp.asarray([260.0, 260.0, 160.0, 120.0])
    dist = jnp.zeros(4)
    pool = []
    rng = np.random.RandomState(seed)

    def harvest(world, n_frames, lateral, forward, yaw):
        traj = synthetic.smooth_trajectory(
            n_frames, lateral=lateral, forward=forward, yaw=yaw,
            seed=rng.randint(1 << 30),
        )
        for T in traj:
            img = world.render(jnp.asarray(T), K, 240, 320)
            f = make_frame(img, K, dist, fc)
            d = np.asarray(f.desc)[np.asarray(f.valid)]
            if len(d):
                pool.append(d.astype(np.uint8))

    # procedural worlds with different texture seeds/statistics
    for s in range(6):
        world = synthetic.PlaneWorld(seed=100 + s, tex_size=1024,
                                     plane_z=6.0, extent=30.0)
        harvest(world, 14, lateral=2.0 + 0.3 * s, forward=0.5, yaw=0.08)
    # a real photograph as texture (matplotlib sample data)
    try:
        from PIL import Image
        from matplotlib import cbook

        p = cbook.get_sample_data("grace_hopper.jpg", asfileobj=False)
        photo = np.asarray(Image.open(p).convert("L"), np.float32)
        tile = np.concatenate([photo, photo[:, ::-1]], axis=1)
        tile = np.concatenate([tile, tile[::-1]], axis=0)
        world = synthetic.PlaneWorld(seed=0, tex_size=1024, plane_z=6.0,
                                     extent=30.0)
        t = np.asarray(Image.fromarray(tile.astype(np.uint8)).resize(
            (world.texture.shape[1], world.texture.shape[0])))
        world.texture = jnp.asarray(t.astype(np.float32))
        harvest(world, 20, lateral=1.8, forward=0.6, yaw=0.1)
    except Exception as e:  # photo source optional
        print(f"photo texture skipped: {e}", file=sys.stderr)

    descs = np.concatenate(pool)
    if len(descs) > n_target:
        descs = descs[np.random.RandomState(1).choice(
            len(descs), n_target, replace=False)]
    return descs


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default=None)
    ap.add_argument("--branch", type=int, default=10)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--descs", type=int, default=120_000)
    args = ap.parse_args(argv)
    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "..",
        "data", "voc_default.npz",
    )

    from ..placerec import vocabulary

    print("collecting descriptors...", file=sys.stderr)
    descs = collect_descriptors(args.descs)
    print(f"training on {len(descs)} descriptors "
          f"({args.branch}^{args.depth} = {args.branch ** args.depth} words)",
          file=sys.stderr)
    voc = vocabulary.train(descs, branch=args.branch, depth=args.depth, seed=0)
    vocabulary.save(voc, out)
    print(f"saved {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
