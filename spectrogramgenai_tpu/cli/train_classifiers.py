"""Classifier sweep CLI (rebuild of reference train_classifiers.py +
helpers.train_model).

For each model in --models and each synthetic count in --synths: build the
real+synthetic training mix, train with Adam(1e-3) + the reference freeze
policy, evaluate val/test per epoch with the full metric suite, checkpoint
the best-val-accuracy params, and append per-epoch metrics to a CSV
(helpers.py:870-922 schema capability).

  python -m spectrogramgenai_tpu.cli.train_classifiers \
      --train_dir datasets/train --val_dir datasets/val --test_dir datasets/test \
      --gen_dir gen_images --models custom,resnet --synths 0,50
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np


def evaluate(task, state, src, mesh, batch_size: int, num_classes: int):
    from spectrogramgenai_tpu.data.pipeline import padded_eval_batches
    from spectrogramgenai_tpu.eval.classification import ClassificationMetrics

    eval_step = task.make_eval_step()
    metrics = ClassificationMetrics(num_classes)
    for sharded, n in padded_eval_batches(src, batch_size, mesh):
        logits, loss = eval_step(state, sharded["image"], sharded["label"])
        metrics.update(np.asarray(logits)[:n], np.asarray(sharded["label"])[:n], float(loss))
    return metrics


def task_model_file(model_name: str) -> str:
    """Map short model names to torchvision converter file stems."""
    return {"resnet": "resnet18", "vgg": "vgg16", "mobilenet": "mobilenet_v2"}.get(
        model_name, model_name)


def load_denoiser_apply(ckpt_dir: str | None):
    """Optional noise-reduction preprocessing: x ← renorm(x − denoise(x))
    (reference nr_path flow, train_acgan.py:31-35, helpers.py:758-761)."""
    if not ckpt_dir:
        return None
    import jax
    import jax.numpy as jnp

    from spectrogramgenai_tpu.core.checkpoint import CheckpointManager
    from spectrogramgenai_tpu.models.denoiser import TransformerDenoiser

    model = TransformerDenoiser()
    template = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 256, 256, 1)))
    restored = CheckpointManager(ckpt_dir).restore({"params": template["params"]})
    if restored is None:
        raise FileNotFoundError(f"no denoiser checkpoint under {ckpt_dir}")

    def apply(x):
        return model.apply({"params": restored["params"]}, x, deterministic=True)

    return apply


def train_one(model_name: str, synth: int, args, cfg_base):
    from spectrogramgenai_tpu.core.checkpoint import CheckpointManager
    from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh
    from spectrogramgenai_tpu.core.metrics import MetricsLogger
    from spectrogramgenai_tpu.data.pipeline import (
        ImageFolderSource,
        device_prefetch,
        iterate_batches,
    )
    from spectrogramgenai_tpu.train.classifier_task import ClassifierTask

    from spectrogramgenai_tpu.cli.common import setup

    cfg = dataclasses.replace(cfg_base, model_name=model_name, synthetic_per_class=synth)
    setup(cfg.run)
    if getattr(args, "denoiser_ckpt", None):
        cfg = dataclasses.replace(cfg, use_denoiser=True)
    mesh = create_mesh(MeshSpec(cfg.run.mesh_data, cfg.run.mesh_model))

    train_src = ImageFolderSource(args.train_dir, seed=cfg.run.seed, img_size=cfg.data.img_size,
                                  cache_decoded=cfg.data.cache_decoded,
                                  cache_budget_mb=cfg.data.cache_budget_mb)
    if synth > 0 and args.gen_dir:
        _inject_synthetic(train_src, args.gen_dir, synth, cfg.synthetic_cap, cfg.run.seed)
    if getattr(args, "embeddings_csv", None):
        # BirdNET embedding soft targets for knowledge distillation
        # (reference helpers.py:612-637 merges embedding CSVs into the df).
        _attach_embeddings(train_src, args.embeddings_csv)
        cfg = dataclasses.replace(cfg, knowledge_dist=True)
    val_src = ImageFolderSource(args.val_dir, img_size=cfg.data.img_size,
                                cache_decoded=cfg.data.cache_decoded,
                                cache_budget_mb=cfg.data.cache_budget_mb)
    test_src = ImageFolderSource(args.test_dir, img_size=cfg.data.img_size,
                                 cache_decoded=cfg.data.cache_decoded,
                                 cache_budget_mb=cfg.data.cache_budget_mb) if args.test_dir else None
    num_classes = len(train_src.classes)
    cfg = dataclasses.replace(cfg, num_classes=num_classes)

    pretrained = None
    if getattr(args, "pretrained_dir", None):
        cand = os.path.join(args.pretrained_dir, f"{task_model_file(model_name)}_imagenet.msgpack")
        pretrained = cand if os.path.exists(cand) else None
        if pretrained is None:
            print(f"note: no converted weights at {cand}; training {model_name} from scratch")

    task = ClassifierTask(cfg, mesh, denoiser_apply=load_denoiser_apply(getattr(args, "denoiser_ckpt", None)))
    state = task.init_state(img_size=cfg.data.img_size, pretrained_path=pretrained)
    step = task.make_train_step()

    tag = f"{model_name}_synth{synth}{'_kd' if cfg.knowledge_dist else ''}"
    run_dir = os.path.join(cfg.run.output_dir, tag)
    logger = MetricsLogger(run_dir, csv_name=f"{tag}_metrics.csv",
                           csv_columns=["epoch", "train_loss", "train_acc", "val_acc", "val_f1",
                                        "val_precision", "val_recall", "test_acc", "test_f1"])
    ckpt = CheckpointManager(os.path.join(cfg.run.output_dir, "ckpt_" + tag))

    best_val = -1.0
    for epoch in range(cfg.epochs):
        tl, ta, nb = 0.0, 0.0, 0
        for batch in device_prefetch(iterate_batches(train_src, cfg.data.batch_size, epochs=1), mesh):
            state, m = step(state, batch["image"], batch["label"], batch.get("embedding"))
            tl += float(m["train_loss"]); ta += float(m["train_acc"]); nb += 1
        val = evaluate(task, state, val_src, mesh, 2 * cfg.data.batch_size, num_classes).compute()
        test = (evaluate(task, state, test_src, mesh, 2 * cfg.data.batch_size, num_classes).compute()
                if test_src else {})
        row = {"epoch": epoch, "train_loss": tl / max(1, nb), "train_acc": ta / max(1, nb),
               "val_acc": val["accuracy"], "val_f1": val["f1"], "val_precision": val["precision"],
               "val_recall": val["recall"], "test_acc": test.get("accuracy", ""),
               "test_f1": test.get("f1", "")}
        logger.log(epoch, **{k: v for k, v in row.items() if v != ""})
        logger.log_csv_row(row)
        if val["accuracy"] > best_val:  # best-val checkpoint (helpers.py:864-868)
            best_val = val["accuracy"]
            ckpt.save(epoch, state, best=True, metric=best_val)
        print(f"{tag} epoch {epoch}: train_loss={row['train_loss']:.4f} val_acc={val['accuracy']:.4f}")
    return best_val


def _attach_embeddings(src, embeddings_csv: str):
    """Attach per-file BirdNET embedding vectors to an ImageFolderSource.

    CSV columns: file_name, embeddings (comma-joined floats). Files without a
    row get a zero vector (KD term then pushes toward uniform — matching the
    reference's behavior of only distilling where embeddings exist is achieved
    by passing a curated CSV)."""
    import pandas as pd

    df = pd.read_csv(embeddings_csv)
    table = {os.path.basename(fn): np.asarray([float(v) for v in emb.split(",")], np.float32)
             for fn, emb in zip(df["file_name"], df["embeddings"])}
    dim = len(next(iter(table.values())))

    def embed_row(i):
        return table.get(os.path.basename(src.paths[i]), np.zeros(dim, np.float32))

    orig_load = src.load

    def load(i):
        out = orig_load(i)
        out["embedding"] = embed_row(i)
        return out

    src.load = load

    # iterate_batches prefers the whole-batch native-decode path when the
    # source has one — wrap it too, or the KD targets silently never reach
    # the train step (embeddings=None → plain CE, no error).
    orig_load_batch = getattr(src, "load_batch", None)
    if orig_load_batch is not None:
        def load_batch(chunk, num_threads=8):
            out = orig_load_batch(chunk, num_threads=num_threads)
            out["embedding"] = np.stack([embed_row(int(i)) for i in chunk])
            return out

        src.load_batch = load_batch


def _inject_synthetic(src, gen_dir: str, per_class: int, cap: int, seed: int):
    """Append per-class generated PNGs (idx<cap) to an ImageFolderSource."""
    import re

    rng = np.random.default_rng(seed)
    pattern = re.compile(r"^(.+)_gen_imgs_(\d+)_(\d+)\.png$")
    by_class = {c: [] for c in src.classes}
    for f in sorted(os.listdir(gen_dir)):
        m = pattern.match(f)
        if m and m.group(1) in by_class and int(m.group(3)) < cap:
            by_class[m.group(1)].append(os.path.join(gen_dir, f))
    new_paths, new_labels = [], []
    for ci, cname in enumerate(src.classes):
        files = by_class[cname]
        take = min(per_class, len(files))
        if take:
            chosen = rng.choice(np.asarray(files), size=take, replace=False)
            new_paths.extend(chosen)
            new_labels.extend([ci] * take)
    src.paths = list(src.paths) + new_paths
    src.labels = np.concatenate([src.labels, np.asarray(new_labels, src.labels.dtype)])


def main(argv=None):
    from spectrogramgenai_tpu.core.config import ClassifierConfig, add_config_args, apply_overrides

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train_dir", required=True)
    p.add_argument("--val_dir", required=True)
    p.add_argument("--test_dir", default=None)
    p.add_argument("--gen_dir", default=None)
    p.add_argument("--models", default="resnet,vgg,mobilenet,custom,ensemble")
    p.add_argument("--synths", default="0,50,100,150,200,250")
    p.add_argument("--denoiser_ckpt", default=None)
    p.add_argument("--embeddings_csv", default=None,
                   help="BirdNET embeddings CSV (file_name, embeddings) → enables KD")
    p.add_argument("--pretrained_dir", default=None,
                   help="dir of converted ImageNet weights ({model}_imagenet.msgpack, "
                        "see tools/convert_torchvision.py)")
    add_config_args(p, ClassifierConfig)
    a = p.parse_args(argv)
    cfg = apply_overrides(ClassifierConfig(), a)

    results = {}
    for model_name in a.models.split(","):
        for synth in (int(s) for s in a.synths.split(",")):
            results[(model_name, synth)] = train_one(model_name, synth, a, cfg)
    for (mn, sy), acc in results.items():
        print(f"{mn} synth={sy}: best val acc {acc:.4f}")


if __name__ == "__main__":
    main()
