"""FID CLI (reference README.md:58-62: `python -m pytorch_fid folder1 folder2`).

Computes Fréchet Inception Distance between two image folders using the flax
InceptionV3 2048-d pool features.

  python -m spectrogramgenai_tpu.cli.fid --dir1 real_images --dir2 gen_images \
      --weights models/inception_v3.msgpack
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def compute_features(images_u8: np.ndarray, params=None, batch: int = 32) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    from spectrogramgenai_tpu.eval.inception import InceptionV3

    model = InceptionV3()
    if params is None:
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)), train=False)

    @jax.jit
    def forward(x):
        x = x.astype(jnp.float32) / 255.0
        x = (x - 0.5) / 0.5
        return model.apply(params, x, train=False, return_features=True)

    feats = []
    for i in range(0, len(images_u8), batch):
        chunk = images_u8[i : i + batch]
        pad = batch - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad, 299, 299, 3), np.uint8)])
        out = np.asarray(forward(jnp.asarray(chunk)))
        feats.append(out[: batch - pad] if pad else out)
    return np.concatenate(feats)


def main(argv=None):
    from spectrogramgenai_tpu.cli.inception_score import load_images
    from spectrogramgenai_tpu.eval.inception import (
        frechet_distance,
        gaussian_statistics,
        load_inception_params,
    )

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dir1", required=True)
    p.add_argument("--dir2", required=True)
    p.add_argument("--weights", default=None)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--allow_random_weights", type=int, default=0)
    a = p.parse_args(argv)

    params = load_inception_params(a.weights)
    if params is None and not a.allow_random_weights:
        sys.exit("no converted InceptionV3 weights; pass --weights (tools/convert_torchvision.py) "
                 "or --allow_random_weights 1 for a smoke run")
    if params is None:
        print("WARNING: random InceptionV3 weights — FID is NOT meaningful")

    f1 = compute_features(load_images(a.dir1, a.limit), params)
    f2 = compute_features(load_images(a.dir2, a.limit), params)
    mu1, s1 = gaussian_statistics(f1)
    mu2, s2 = gaussian_statistics(f2)
    print(f"FID: {frechet_distance(mu1, s1, mu2, s2):.4f}  (n1={len(f1)}, n2={len(f2)})")


if __name__ == "__main__":
    main()
