"""Train a visual vocabulary from a dataset's images (replaces shipping
the pre-trained ORBvoc binary: descriptors and vocabulary stay mutually
consistent within the framework)."""

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser("train_vocab")
    p.add_argument("settings")
    p.add_argument("sequences", nargs="+",
                   help="dataset dirs (TUM/EuRoC/KITTI auto-detected)")
    p.add_argument("--out", default="vocab.npz")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--L", type=int, default=4)
    p.add_argument("--stride", type=int, default=10,
                   help="use every Nth frame")
    p.add_argument("--max-desc", type=int, default=200_000)
    args = p.parse_args(argv)

    from ygz_tpu.matching import vocabulary as vm
    from ygz_tpu.pipeline import frame as fmod
    from ygz_tpu.utils import datasets
    from ygz_tpu.utils.config import load_config
    import os

    cfg = load_config(args.settings)
    descs = []
    for seq in args.sequences:
        if os.path.exists(os.path.join(seq, "rgb.txt")):
            it = datasets.load_tum_mono(seq)
        elif os.path.exists(os.path.join(seq, "times.txt")):
            it = datasets.load_kitti_mono(seq)
        else:
            it = datasets.load_euroc_mono(seq)
        for i, (t, img) in enumerate(it):
            if i % args.stride:
                continue
            fr = fmod.extract_features(
                fmod.make_frame(img, i, t, cfg), cfg)
            m = np.asarray(fr.feat_mask)
            descs.append(np.asarray(fr.desc)[m])
            if sum(len(d) for d in descs) > args.max_desc:
                break
    alld = np.concatenate(descs)[:args.max_desc]
    print(f"training on {len(alld)} descriptors (k={args.k}, L={args.L})")
    vocab = vm.train_vocabulary(alld, k=args.k, L=args.L)
    np.savez(args.out, k=vocab.k, L=vocab.L,
             node_desc=np.asarray(vocab.node_desc),
             word_idf=np.asarray(vocab.word_idf))
    print("->", args.out)


if __name__ == "__main__":
    main()
