"""Train an ORB vocabulary from a dataset directory.

DBoW2's offline create() equivalent (the reference ships a pre-trained
1e5-word ORBvoc.txt instead — stripped from this fork):

    python scripts/train_vocabulary.py --images /data/MH01/mav0/cam0/data \
        --out my_voc.npz --k 10 --L 3 [--max-images 80]
"""

import argparse
import glob
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True, help="directory of images")
    ap.add_argument("--out", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--L", type=int, default=3)
    ap.add_argument("--max-images", type=int, default=100)
    ap.add_argument("--n-features", type=int, default=1024)
    args = ap.parse_args()

    import numpy as np
    import jax.numpy as jnp
    from orb_slam3_comments_ghr_tpu.frontend import extract
    from orb_slam3_comments_ghr_tpu.io.datasets import load_image
    from orb_slam3_comments_ghr_tpu.retrieval.vocabulary import Vocabulary

    paths = sorted(
        p for ext in ("png", "jpg", "pgm", "npy")
        for p in glob.glob(os.path.join(args.images, f"*.{ext}"))
    )[: args.max_images]
    if not paths:
        raise SystemExit(f"no images found under {args.images}")

    descs = []
    for p in paths:
        img = load_image(p)
        f = extract(jnp.asarray(img), n_features=args.n_features)
        d = np.asarray(f.desc)[np.asarray(f.valid)]
        descs.append(d)
    corpus = np.concatenate(descs)
    print(f"training k={args.k} L={args.L} on {len(corpus)} descriptors "
          f"from {len(paths)} images")
    voc = Vocabulary.train(corpus, k=args.k, L=args.L)
    voc.save(args.out)
    print(f"saved {voc.n_words}-word vocabulary to {args.out}")


if __name__ == "__main__":
    main()
