"""Inception Score CLI (rebuild of reference inception_score.py).

Folder of PNGs → RGB 299×299 → InceptionV3 logits → IS mean±std (splits=10).

Requires converted ImageNet weights (tools/convert_torchvision.py →
--weights). Without them the CLI refuses to print a score unless
--allow_random_weights 1 is passed (pipeline smoke-testing only).

  python -m spectrogramgenai_tpu.cli.inception_score --image_dir gen_images \
      --weights models/inception_v3.msgpack
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def load_images(image_dir: str, limit: int | None = None) -> np.ndarray:
    """Load every PNG/JPEG under ``image_dir`` (recursively — flat folders and
    datasets/{split}/{class}/ ImageFolder trees both work) as 299×299 RGB."""
    from PIL import Image

    files = sorted(
        os.path.join(root, f)
        for root, _dirs, names in os.walk(image_dir)
        for f in names
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    if limit and len(files) > limit:
        # deterministic uniform subsample — a sorted-prefix cut would take
        # only the alphabetically-first classes of an ImageFolder tree
        keep = np.random.default_rng(0).choice(len(files), size=limit, replace=False)
        files = [files[i] for i in sorted(keep)]
    if not files:
        raise FileNotFoundError(f"no images in {image_dir}")
    out = []
    for f in files:
        img = Image.open(f).convert("RGB").resize((299, 299), Image.BILINEAR)
        out.append(np.asarray(img, np.uint8))
    return np.stack(out)


def compute_probs(images_u8: np.ndarray, params=None, batch: int = 32) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    from spectrogramgenai_tpu.eval.inception import InceptionV3

    model = InceptionV3()
    if params is None:
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)), train=False)

    @jax.jit
    def forward(x):
        x = x.astype(jnp.float32) / 255.0
        x = (x - 0.5) / 0.5  # [-1, 1] input scaling
        return jax.nn.softmax(model.apply(params, x, train=False), axis=-1)

    probs = []
    for i in range(0, len(images_u8), batch):
        chunk = images_u8[i : i + batch]
        if len(chunk) < batch:  # pad to static shape
            pad = batch - len(chunk)
            chunk = np.concatenate([chunk, np.zeros((pad, 299, 299, 3), np.uint8)])
            probs.append(np.asarray(forward(jnp.asarray(chunk)))[: batch - pad])
        else:
            probs.append(np.asarray(forward(jnp.asarray(chunk))))
    return np.concatenate(probs)


def main(argv=None):
    from spectrogramgenai_tpu.eval.inception import inception_score, load_inception_params

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image_dir", required=True)
    p.add_argument("--weights", default=None)
    p.add_argument("--splits", type=int, default=10)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--allow_random_weights", type=int, default=0)
    a = p.parse_args(argv)

    params = load_inception_params(a.weights)
    if params is None and not a.allow_random_weights:
        sys.exit("no converted InceptionV3 weights found; pass --weights (see "
                 "tools/convert_torchvision.py) or --allow_random_weights 1 for a smoke run")
    if params is None:
        print("WARNING: random InceptionV3 weights — score is NOT meaningful")

    images = load_images(a.image_dir, a.limit)
    probs = compute_probs(images, params)
    mean, std = inception_score(probs, splits=a.splits)
    print(f"Inception Score: {mean:.4f} ± {std:.4f}  (n={len(images)})")


if __name__ == "__main__":
    main()
