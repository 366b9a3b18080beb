"""Best-classifier evaluation harness (rebuild of reference
eval_best_classifiers.py + helpers.eval_best_model/eval_report_cm).

Reloads each (model × synth) best checkpoint, runs val+test with the full
metric suite (incl. top-3), and writes: eval CSV, per-class classification
report CSV, and a confusion-matrix heatmap PNG.
"""

from __future__ import annotations

import argparse
import dataclasses
import os


def eval_one(model_name: str, synth: int, args, cfg_base):
    from spectrogramgenai_tpu.core.checkpoint import CheckpointManager
    from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh
    from spectrogramgenai_tpu.data.pipeline import ImageFolderSource
    from spectrogramgenai_tpu.train.classifier_task import ClassifierTask
    from spectrogramgenai_tpu.cli.train_classifiers import evaluate

    cfg = dataclasses.replace(cfg_base, model_name=model_name, synthetic_per_class=synth)
    mesh = create_mesh(MeshSpec(cfg.run.mesh_data, cfg.run.mesh_model))
    val_src = ImageFolderSource(args.val_dir, img_size=cfg.data.img_size,
                                cache_decoded=cfg.data.cache_decoded,
                                cache_budget_mb=cfg.data.cache_budget_mb)
    test_src = ImageFolderSource(args.test_dir, img_size=cfg.data.img_size,
                                 cache_decoded=cfg.data.cache_decoded,
                                 cache_budget_mb=cfg.data.cache_budget_mb) if args.test_dir else None
    num_classes = len(val_src.classes)
    cfg = dataclasses.replace(cfg, num_classes=num_classes)

    task = ClassifierTask(cfg, mesh)
    state = task.init_state(img_size=cfg.data.img_size)
    tag = f"{model_name}_synth{synth}{'_kd' if cfg.knowledge_dist else ''}"
    ckpt = CheckpointManager(os.path.join(cfg.run.output_dir, "ckpt_" + tag))
    restored = ckpt.restore(state, best=True)
    if restored is None:
        print(f"skip {tag}: no best checkpoint")
        return None
    state = restored

    out = {"model": model_name, "synth": synth}
    val_m = evaluate(task, state, val_src, mesh, 2 * cfg.data.batch_size, num_classes)
    out.update({f"val_{k}": v for k, v in val_m.compute().items()})
    if test_src is not None:
        test_m = evaluate(task, state, test_src, mesh, 2 * cfg.data.batch_size, num_classes)
        out.update({f"test_{k}": v for k, v in test_m.compute().items()})
        _write_reports(test_m, val_src.classes, args.out_dir, tag)
    return out


def _write_reports(metrics, class_names, out_dir: str, tag: str):
    os.makedirs(out_dir, exist_ok=True)
    report = metrics.classification_report(class_names)
    report.to_csv(os.path.join(out_dir, f"{tag}_classification_report.csv"))
    # confusion-matrix heatmap (helpers.py:938-951 capability)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 8))
    im = ax.imshow(metrics.cm, cmap="viridis")
    ax.set_xlabel("predicted")
    ax.set_ylabel("true")
    ax.set_xticks(range(len(class_names)))
    ax.set_yticks(range(len(class_names)))
    ax.set_xticklabels(class_names, rotation=90, fontsize=6)
    ax.set_yticklabels(class_names, fontsize=6)
    fig.colorbar(im)
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, f"{tag}_confusion_matrix.png"), dpi=150)
    plt.close(fig)


def main(argv=None):
    import pandas as pd

    from spectrogramgenai_tpu.core.config import ClassifierConfig, add_config_args, apply_overrides

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--val_dir", required=True)
    p.add_argument("--test_dir", default=None)
    p.add_argument("--out_dir", default="results/eval")
    p.add_argument("--models", default="resnet,vgg,mobilenet,custom,ensemble")
    p.add_argument("--synths", default="0,50,100,150,200,250")
    add_config_args(p, ClassifierConfig)
    a = p.parse_args(argv)
    cfg = apply_overrides(ClassifierConfig(), a)

    rows = []
    for model_name in a.models.split(","):
        for synth in (int(s) for s in a.synths.split(",")):
            row = eval_one(model_name, synth, a, cfg)
            if row:
                rows.append(row)
    os.makedirs(a.out_dir, exist_ok=True)
    pd.DataFrame(rows).to_csv(os.path.join(a.out_dir, "eval_results.csv"), index=False)
    print(f"wrote {len(rows)} rows to {a.out_dir}/eval_results.csv")


if __name__ == "__main__":
    main()
