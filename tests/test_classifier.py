"""Classifier task + metrics tests."""

import jax
import jax.numpy as jnp
import numpy as np

from spectrogramgenai_tpu.core.config import ClassifierConfig, DataConfig, RunConfig
from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh, shard_batch
from spectrogramgenai_tpu.eval.classification import (
    ClassificationMetrics,
    confusion_matrix,
    macro_precision_recall_f1,
    top_k_accuracy,
)
from spectrogramgenai_tpu.train.classifier_task import ClassifierTask, kd_loss


def test_metrics_against_sklearn():
    from sklearn.metrics import precision_recall_fscore_support

    rng = np.random.default_rng(0)
    labels = rng.integers(0, 5, 200)
    preds = rng.integers(0, 5, 200)
    cm = np.asarray(confusion_matrix(jnp.asarray(preds), jnp.asarray(labels), 5))
    p, r, f1 = macro_precision_recall_f1(jnp.asarray(cm))
    sp, sr, sf1, _ = precision_recall_fscore_support(labels, preds, average="macro", zero_division=0)
    assert abs(float(p) - sp) < 1e-6
    assert abs(float(r) - sr) < 1e-6
    assert abs(float(f1) - sf1) < 1e-6


def test_topk_and_streaming_metrics():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(64, 10)).astype(np.float32)
    labels = rng.integers(0, 10, 64)
    top1 = float(top_k_accuracy(jnp.asarray(logits), jnp.asarray(labels), 1))
    assert abs(top1 - (logits.argmax(-1) == labels).mean()) < 1e-6

    m = ClassificationMetrics(10)
    m.update(logits[:32], labels[:32], loss=1.0)
    m.update(logits[32:], labels[32:], loss=2.0)
    out = m.compute()
    assert abs(out["top1_acc"] - top1) < 1e-6
    assert out["loss"] == 1.5
    report = m.classification_report([f"c{i}" for i in range(10)])
    assert len(report) == 10 and report["support"].sum() == 64


def test_kd_loss_matches_torch():
    import torch

    rng = np.random.default_rng(2)
    logits = rng.normal(size=(8, 27)).astype(np.float32)
    emb = rng.normal(size=(8, 27)).astype(np.float32)
    T = 3.0
    st = torch.nn.functional.softmax(torch.tensor(emb) / T, dim=-1)
    sp = torch.nn.functional.log_softmax(torch.tensor(logits) / T, dim=-1)
    want = (torch.sum(st * (st.log() - sp)) / sp.size()[0] * (T**2)).item()
    got = float(kd_loss(jnp.asarray(logits), jnp.asarray(emb), T))
    assert abs(want - got) < 1e-3


def test_custom_classifier_trains():
    cfg = ClassifierConfig(model_name="custom", num_classes=5,
                           data=DataConfig(batch_size=8, img_size=64),
                           run=RunConfig(seed=0), compute_dtype="float32")
    mesh = create_mesh(MeshSpec(data=8))
    task = ClassifierTask(cfg, mesh)
    state = task.init_state(img_size=64)
    step = task.make_train_step()
    rng = np.random.default_rng(0)
    # learnable signal: class k has a bright k-th row block
    losses = []
    for i in range(30):
        labels = rng.integers(0, 5, (8,)).astype(np.int32)
        images = rng.uniform(0, 0.2, (8, 64, 64, 1)).astype(np.float32)
        for b, lab in enumerate(labels):
            images[b, lab * 12 : lab * 12 + 12] += 0.8
        batch = shard_batch(mesh, {"image": images, "label": labels})
        state, m = step(state, batch["image"], batch["label"])
        losses.append(float(m["train_loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])

    eval_step = task.make_eval_step()
    logits, loss = eval_step(state, batch["image"], batch["label"])
    assert logits.shape == (8, 5) and np.isfinite(float(loss))


def test_frozen_backbone_mask():
    from spectrogramgenai_tpu.models.classifiers import ResNet18, trainable_mask

    model = ResNet18(5)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    mask = trainable_mask(v["params"], "resnet")
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    trainable = {".".join(str(getattr(p, "key", "")) for p in path) for path, val in flat if val}
    frozen = {".".join(str(getattr(p, "key", "")) for p in path) for path, val in flat if not val}
    assert any("layer4" in t for t in trainable)
    assert any("fc" in t for t in trainable)
    assert any("layer1" in f for f in frozen)
    assert any("stem" in f for f in frozen)


def test_ensemble_classifier_smoke():
    """Ensemble = 4 backbones with channel adapters → concat logits → head."""
    from spectrogramgenai_tpu.models.classifiers import EnsembleClassifier, trainable_mask

    model = EnsembleClassifier(num_classes=5)
    x = jnp.zeros((1, 64, 64, 1))
    v = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                   x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (1, 5)

    # freeze policy: only the fusion head trains (Classifiers.py freeze_layers)
    mask = trainable_mask(v["params"], "ensemble")
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    trainable = [p for p, val in flat if val]
    assert trainable and all("classifier" in str(p[0]) for p in trainable)


def test_pretrained_weight_loading(tmp_path):
    """Converted ImageNet weights merge into the init tree; head stays fresh."""
    from flax import serialization

    from spectrogramgenai_tpu.models.classifiers import ResNet18

    # fabricate a "converted" checkpoint: a resnet18 tree with distinctive values
    donor = ResNet18(num_classes=1000)
    dv = donor.init(jax.random.PRNGKey(7), jnp.zeros((1, 32, 32, 3)), train=False)
    marked = jax.tree_util.tree_map(lambda x: jnp.full_like(x, 0.123), dv["params"])
    payload = serialization.msgpack_serialize(
        {"params": jax.device_get(marked), "batch_stats": jax.device_get(dv["batch_stats"])})
    path = str(tmp_path / "resnet18_imagenet.msgpack")
    open(path, "wb").write(payload)

    cfg = ClassifierConfig(model_name="resnet", num_classes=5,
                           data=DataConfig(batch_size=8, img_size=32),
                           run=RunConfig(seed=0), compute_dtype="float32")
    mesh = create_mesh(MeshSpec(data=8))
    task = ClassifierTask(cfg, mesh)
    state = task.init_state(img_size=32, pretrained_path=path)

    # backbone took donor values; 5-class head kept fresh init (shape differs)
    stem = np.asarray(state.params["stem_conv"]["kernel"])
    assert np.allclose(stem, 0.123)
    head = np.asarray(state.params["fc"]["kernel"])
    assert head.shape[-1] == 5 and not np.allclose(head, 0.123)


def test_vgg16_train_step_jits():
    """Regression: adaptive_avg_pool's window bounds must be Python ints —
    jnp.floor-derived bounds raise ConcretizationTypeError under jit (vgg16
    and ensemble were never exercised through the jitted train step)."""
    cfg = ClassifierConfig(model_name="vgg16", num_classes=5,
                           data=DataConfig(batch_size=2, img_size=32),
                           run=RunConfig(seed=0))
    mesh = create_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    task = ClassifierTask(cfg, mesh)
    state = task.init_state(img_size=32, seed=0)
    step = task.make_train_step()
    imgs = jnp.zeros((2, 32, 32, 1), jnp.float32)
    labs = jnp.zeros((2,), jnp.int32)
    state, m = step(state, imgs, labs)
    assert jnp.isfinite(jnp.asarray(list(m.values())[0])).all()


def test_attach_embeddings_reaches_batches(tmp_path):
    """Regression: _attach_embeddings patched only src.load, but
    iterate_batches prefers the whole-batch load_batch path — KD targets
    silently never reached the train step (embeddings=None → plain CE)."""
    from PIL import Image

    from spectrogramgenai_tpu.cli.train_classifiers import _attach_embeddings
    from spectrogramgenai_tpu.data.pipeline import ImageFolderSource, iterate_batches

    rng = np.random.default_rng(0)
    names = []
    for c in ["a", "b"]:
        d = tmp_path / "train" / c
        d.mkdir(parents=True)
        for i in range(3):
            name = f"{c}_{i}.png"
            Image.fromarray(rng.integers(0, 256, (16, 16), np.uint8), mode="L").save(d / name)
            names.append(name)

    emb = {n: rng.normal(size=4).astype(np.float32) for n in names[:-1]}  # one file missing
    csv = tmp_path / "emb.csv"
    with open(csv, "w") as f:
        f.write("file_name,embeddings\n")
        for n, v in emb.items():
            f.write(f"{n},\"{','.join(str(x) for x in v)}\"\n")

    src = ImageFolderSource(str(tmp_path / "train"), img_size=16, seed=0)
    _attach_embeddings(src, str(csv))

    import os as _os

    for batch in iterate_batches(src, 3, epochs=1):  # load_batch path
        assert "embedding" in batch and batch["embedding"].shape == (3, 4)
    # values line up with the right files (and missing files get zeros)
    full = src.load_batch(np.arange(6))
    for i in range(6):
        base = _os.path.basename(src.paths[i])
        want = emb.get(base, np.zeros(4, np.float32))
        np.testing.assert_allclose(full["embedding"][i], want)
    # the per-sample path stays consistent with the batch path
    np.testing.assert_allclose(src.load(5)["embedding"], full["embedding"][5])
