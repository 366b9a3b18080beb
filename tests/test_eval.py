"""IS/FID/FAD math tests + InceptionV3 shape + converter coverage."""

import numpy as np
import jax
import jax.numpy as jnp

from spectrogramgenai_tpu.eval.fad import fad_score
from spectrogramgenai_tpu.eval.inception import (
    InceptionV3,
    frechet_distance,
    gaussian_statistics,
    inception_score,
)


def test_inception_score_bounds():
    # uniform predictions → IS = 1
    probs = np.full((100, 10), 0.1)
    mean, std = inception_score(probs, splits=5)
    assert abs(mean - 1.0) < 1e-6 and std < 1e-6

    # perfectly confident + perfectly diverse → IS = num_classes
    probs = np.eye(10)[np.arange(100) % 10]
    mean, _ = inception_score(probs + 1e-12, splits=5)
    assert abs(mean - 10.0) < 1e-3


def test_frechet_distance_properties():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(500, 8))
    mu, s = gaussian_statistics(x)
    assert frechet_distance(mu, s, mu, s) < 1e-6

    y = rng.normal(loc=3.0, size=(500, 8))
    mu2, s2 = gaussian_statistics(y)
    d = frechet_distance(mu, s, mu2, s2)
    assert abs(d - 8 * 9.0) < 8.0  # ‖μ1−μ2‖² ≈ 8·3² dominates


def test_fad_score():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(200, 16))
    b = rng.normal(size=(200, 16))
    same = fad_score(a, a)
    diff = fad_score(a, b + 5.0)
    assert same < 1e-6 and diff > 100


def test_inception_v3_shapes():
    model = InceptionV3()
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)), train=False)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(v["params"]))
    # torchvision inception_v3 minus aux head: 27.16M − 3.33M ≈ 23.83M
    assert 23.5e6 < n_params < 24.2e6, n_params
    logits = model.apply(v, jnp.zeros((2, 299, 299, 3)), train=False)
    assert logits.shape == (2, 1000)
    feats = model.apply(v, jnp.zeros((2, 299, 299, 3)), train=False, return_features=True)
    assert feats.shape == (2, 2048)


def _synthetic_resnet18_state_dict():
    """torchvision resnet18 state_dict names/shapes, random values."""
    rng = np.random.default_rng(0)
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.normal(size=(o, i, k, k)).astype(np.float32)

    def bn(name, c):
        for suffix, val in (("weight", np.ones(c)), ("bias", np.zeros(c)),
                            ("running_mean", np.zeros(c)), ("running_var", np.ones(c))):
            sd[f"{name}.{suffix}"] = val.astype(np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    chans = [64, 64, 128, 256, 512]
    for stage in range(1, 5):
        c_in, c_out = chans[stage - 1], chans[stage]
        for block in range(2):
            ci = c_in if block == 0 else c_out
            conv(f"layer{stage}.{block}.conv1", c_out, ci, 3)
            bn(f"layer{stage}.{block}.bn1", c_out)
            conv(f"layer{stage}.{block}.conv2", c_out, c_out, 3)
            bn(f"layer{stage}.{block}.bn2", c_out)
            if block == 0 and stage > 1:
                conv(f"layer{stage}.{block}.downsample.0", c_out, ci, 1)
                bn(f"layer{stage}.{block}.downsample.1", c_out)
    sd["fc.weight"] = rng.normal(size=(1000, 512)).astype(np.float32)
    sd["fc.bias"] = np.zeros(1000, np.float32)
    return sd


def test_resnet18_conversion_covers_flax_tree():
    import sys

    sys.path.insert(0, "tools")
    from convert_torchvision import convert_resnet18

    from spectrogramgenai_tpu.models.classifiers import ResNet18

    sd = _synthetic_resnet18_state_dict()
    converted = convert_resnet18(sd)

    model = ResNet18(num_classes=1000)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)

    def paths(tree, prefix=()):
        if isinstance(tree, dict):
            out = set()
            for k, v in tree.items():
                out |= paths(v, prefix + (k,))
            return out
        return {prefix}

    want_p = paths(jax.device_get(template["params"]))
    got_p = paths(converted["params"])
    assert want_p == got_p, (sorted(want_p - got_p), sorted(got_p - want_p))

    # shapes must line up leaf-by-leaf
    flat_t = jax.tree_util.tree_leaves_with_path(template["params"])
    flat_c = dict_flatten(converted["params"])
    for path, leaf in flat_t:
        key = tuple(str(getattr(p, "key", "")) for p in path)
        assert flat_c[key].shape == leaf.shape, (key, flat_c[key].shape, leaf.shape)


def dict_flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(dict_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def test_load_images_recursive_and_subsample(tmp_path):
    """cli.inception_score.load_images walks ImageFolder trees and takes a
    deterministic uniform subsample when limit < file count (a sorted-prefix
    cut would keep only the alphabetically-first classes)."""
    from PIL import Image

    from spectrogramgenai_tpu.cli.inception_score import load_images

    for cls in ("a", "b"):
        d = tmp_path / "tree" / cls
        d.mkdir(parents=True)
        for i in range(4):
            Image.new("L", (8, 8), color=10 * i).save(d / f"{cls}_{i}.png")

    out = load_images(str(tmp_path / "tree"))
    assert out.shape == (8, 299, 299, 3) and out.dtype == np.uint8

    sub = load_images(str(tmp_path / "tree"), limit=5)
    assert sub.shape[0] == 5
    sub2 = load_images(str(tmp_path / "tree"), limit=5)
    assert np.array_equal(sub, sub2)  # deterministic
