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

    # fid_pool: pytorch-fid patches its branch pools to count_include_pad=False
    # (unlike torchvision) — required for parity with `python -m pytorch_fid`,
    # which is the reference's documented FID recipe (README.md:58-62).
    model = InceptionV3(fid_pool=True)
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


def classifier_features(images_u8: np.ndarray, args, batch: int = 32) -> np.ndarray:
    """Logit-space features from a trained project classifier."""
    import jax
    import jax.numpy as jnp

    from spectrogramgenai_tpu.core.checkpoint import CheckpointManager
    from spectrogramgenai_tpu.core.config import ClassifierConfig
    from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh
    from spectrogramgenai_tpu.train.classifier_task import ClassifierTask

    cfg = ClassifierConfig(model_name=args.classifier_model, num_classes=args.num_classes)
    mesh = create_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    task = ClassifierTask(cfg, mesh)
    state = task.init_state(img_size=256)
    restored = CheckpointManager(args.classifier_ckpt).restore(state, best=True)
    if restored is None:
        restored = CheckpointManager(args.classifier_ckpt).restore(state)
    if restored is None:
        raise FileNotFoundError(f"no classifier checkpoint under {args.classifier_ckpt}")
    state = restored
    eval_step = task.make_eval_step()

    feats = []
    dummy = jnp.zeros((batch,), jnp.int32)
    for i in range(0, len(images_u8), batch):
        chunk = images_u8[i : i + batch]
        pad = batch - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad, *chunk.shape[1:]), chunk.dtype)])
        # grayscale 256×256 input for the project classifiers
        from PIL import Image

        gray = np.stack([
            np.asarray(Image.fromarray(c).convert("L").resize((256, 256)), np.float32) / 255.0
            for c in chunk
        ])[..., None]
        logits, _ = eval_step(state, jnp.asarray(gray), dummy)
        out = np.asarray(logits)
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
    p.add_argument("--classifier_ckpt", default=None,
                   help="use a trained project classifier (cli.train_classifiers best ckpt) "
                        "as the feature extractor — domain-relevant FID without ImageNet weights")
    p.add_argument("--classifier_model", default="custom")
    p.add_argument("--num_classes", type=int, default=27)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--allow_random_weights", type=int, default=0)
    a = p.parse_args(argv)

    if a.classifier_ckpt:
        f1 = classifier_features(load_images(a.dir1, a.limit), a)
        f2 = classifier_features(load_images(a.dir2, a.limit), a)
        mu1, s1 = gaussian_statistics(f1)
        mu2, s2 = gaussian_statistics(f2)
        print(f"FID (classifier '{a.classifier_model}' logits space): "
              f"{frechet_distance(mu1, s1, mu2, s2):.4f}  (n1={len(f1)}, n2={len(f2)})")
        return

    params = load_inception_params(a.weights)
    if params is None and not a.allow_random_weights:
        sys.exit("no converted InceptionV3 weights; pass --weights (tools/convert_torchvision.py), "
                 "--classifier_ckpt for a domain classifier feature space, "
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
