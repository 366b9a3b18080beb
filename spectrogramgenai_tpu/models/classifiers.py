"""Classifier zoo (flax linen, NHWC).

Capability parity with the reference classifier stack:
  * CustomCNN — reference Classifiers.py:6-37 (4×conv/maxpool → FC256 → FC).
  * ResNet18 / VGG16 / MobileNetV2 — the torchvision backbones the reference
    fine-tunes (helpers.py:314-358), rebuilt in flax. ImageNet weights are
    not bundled (no torchvision in this image); `tools/convert_torchvision.py`
    converts a torchvision state_dict into our parameter tree when available,
    otherwise the backbones train from scratch (flagged in the trainer).
  * EnsembleClassifier — reference Classifiers.py:40-65: per-model channel
    adapters, concat logits → ReLU → Linear.
  * trainable_mask — the reference's layer-freeze policy (helpers.py:317-345)
    as an optax-compatible bool pytree.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def adaptive_avg_pool(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """NHWC adaptive average pooling (torch AdaptiveAvgPool2d semantics)."""
    b, h, w, c = x.shape
    oh, ow = out_hw

    def pool_axis(arr, size, out, axis):
        # pure-int window math (floor(i·size/out) ≡ i·size//out for i,size,out
        # > 0): jnp.floor here would make the bounds tracers under jit
        starts = [i * size // out for i in range(out)]
        ends = [-(-(i + 1) * size // out) for i in range(out)]
        slices = [jnp.mean(jax.lax.slice_in_dim(arr, s, e, axis=axis), axis=axis, keepdims=True)
                  for s, e in zip(starts, ends)]
        return jnp.concatenate(slices, axis=axis)

    x = pool_axis(x, h, oh, 1)
    x = pool_axis(x, w, ow, 2)
    return x


class CustomCNN(nn.Module):
    num_classes: int = 27
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        for feats in (16, 32, 64, 128):
            x = nn.Conv(feats, (3, 3), padding=1, dtype=dt)(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)
        x = nn.Dropout(0.5)(x, deterministic=not train)
        x = nn.relu(nn.Dense(256, dtype=dt, name="fc1")(x))
        x = nn.Dropout(0.5)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=dt, name="fc2")(x).astype(jnp.float32)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=self.strides, padding=1, use_bias=False, dtype=dt)(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=dt)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, dtype=dt)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=dt)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1), strides=self.strides, use_bias=False, dtype=dt,
                               name="downsample_conv")(residual)
            residual = nn.BatchNorm(use_running_average=not train, dtype=dt, name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet18(nn.Module):
    num_classes: int = 27
    dtype: jnp.dtype = jnp.float32
    # stop_gradient at the trainable_mask boundary (layer4+fc train): torch's
    # requires_grad=False means the reference never backprops through the
    # frozen prefix (helpers.py:317-325); without this, JAX builds the full
    # backward through the expensive early-high-resolution convs and the
    # optax mask merely discards the result.
    freeze_prefix: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False, dtype=dt, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=dt, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, feats in enumerate((64, 128, 256, 512)):
            if stage == 3 and self.freeze_prefix:
                x = jax.lax.stop_gradient(x)
            for block in range(2):
                strides = 2 if (stage > 0 and block == 0) else 1
                x = BasicBlock(feats, strides, dtype=dt, name=f"layer{stage + 1}_{block}")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=dt, name="fc")(x).astype(jnp.float32)


class VGG16(nn.Module):
    num_classes: int = 27
    dtype: jnp.dtype = jnp.float32
    freeze_prefix: bool = False  # stop_gradient before conv_11 (see ResNet18)

    # conv plan per block (torchvision vgg16 features)
    PLAN = ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512), (512, 512, 512))

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        conv_idx = 0
        for block in self.PLAN:
            for feats in block:
                if conv_idx == 11 and self.freeze_prefix:
                    x = jax.lax.stop_gradient(x)
                x = nn.relu(nn.Conv(feats, (3, 3), padding=1, dtype=dt, name=f"conv_{conv_idx}")(x))
                conv_idx += 1
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = adaptive_avg_pool(x, (7, 7))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(4096, dtype=dt, name="classifier_0")(x))
        x = nn.Dropout(0.5)(x, deterministic=not train)
        x = nn.relu(nn.Dense(4096, dtype=dt, name="classifier_3")(x))
        x = nn.Dropout(0.5)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=dt, name="classifier_6")(x).astype(jnp.float32)


class InvertedResidual(nn.Module):
    features: int
    strides: int
    expand: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        in_c = x.shape[-1]
        hidden = in_c * self.expand
        y = x
        if self.expand != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False, dtype=dt)(y)
            y = nn.BatchNorm(use_running_average=not train, dtype=dt)(y)
            y = nn.relu6(y)
        y = nn.Conv(hidden, (3, 3), strides=self.strides, padding=1, use_bias=False,
                    feature_group_count=hidden, dtype=dt)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=dt)(y)
        y = nn.relu6(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=dt)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=dt)(y)
        if self.strides == 1 and in_c == self.features:
            y = y + x
        return y


class MobileNetV2(nn.Module):
    num_classes: int = 27
    dtype: jnp.dtype = jnp.float32
    freeze_prefix: bool = False  # stop_gradient before features_17 (see ResNet18)

    # (expand t, out channels c, repeats n, stride s) — torchvision spec
    PLAN = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        x = nn.Conv(32, (3, 3), strides=2, padding=1, use_bias=False, dtype=dt, name="features_0")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=dt, name="features_0_bn")(x)
        x = nn.relu6(x)
        idx = 1
        for t, c, n, s in self.PLAN:
            for i in range(n):
                if idx == 17 and self.freeze_prefix:
                    x = jax.lax.stop_gradient(x)
                x = InvertedResidual(c, s if i == 0 else 1, t, dtype=dt, name=f"features_{idx}")(x, train=train)
                idx += 1
        x = nn.Conv(1280, (1, 1), use_bias=False, dtype=dt, name=f"features_{idx}")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=dt, name=f"features_{idx}_bn")(x)
        x = nn.relu6(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(0.2)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=dt, name="classifier")(x).astype(jnp.float32)


# torchvision input-channel conventions: pretrained nets take 3 channels,
# the custom CNN takes 1 (Classifiers.py:50-56 channel adapters).
MODEL_CHANNELS = {"resnet": 3, "vgg": 3, "mobilenet": 3, "custom": 1}


class EnsembleClassifier(nn.Module):
    """Concat sub-model logits → ReLU → Linear (Classifiers.py:40-65)."""

    num_classes: int = 27
    dtype: jnp.dtype = jnp.float32
    freeze_prefix: bool = False  # stop_gradient on sub-model logits (see ResNet18)

    def setup(self):
        self.resnet = ResNet18(self.num_classes, dtype=self.dtype)
        self.vgg = VGG16(self.num_classes, dtype=self.dtype)
        self.mobilenet = MobileNetV2(self.num_classes, dtype=self.dtype)
        self.custom = CustomCNN(self.num_classes, dtype=self.dtype)
        self.classifier = nn.Dense(self.num_classes, dtype=self.dtype)

    def __call__(self, x, train: bool = False):
        # x arrives with 1 channel; adapt per sub-model.
        x1 = x if x.shape[-1] == 1 else jnp.mean(x, axis=-1, keepdims=True)
        x3 = jnp.repeat(x1, 3, axis=-1)
        logits = jnp.concatenate(
            [
                # Sub-models run in inference mode inside the ensemble
                # (reference sets them to eval(), Classifiers.py:49).
                self.resnet(x3, train=False),
                self.vgg(x3, train=False),
                self.mobilenet(x3, train=False),
                self.custom(x1, train=False),
            ],
            axis=-1,
        )
        if self.freeze_prefix:
            # only the fusion head trains (Classifiers.py freeze_layers):
            # XLA then never materializes the 4 backbones' backward
            logits = jax.lax.stop_gradient(logits)
        return self.classifier(nn.relu(logits)).astype(jnp.float32)


def build_classifier(model_name: str, num_classes: int, dtype=jnp.float32,
                     freeze_prefix: bool = False) -> nn.Module:
    """freeze_prefix=True adds stop_gradient at each arch's trainable_mask
    boundary — the torch requires_grad=False semantics (no backward through
    the frozen prefix). Forward values are identical either way."""
    name = {"resnet": "resnet", "resnet18": "resnet", "vgg": "vgg", "vgg16": "vgg",
            "mobilenet": "mobilenet", "mobilenet_v2": "mobilenet",
            "custom": "custom", "ensemble": "ensemble"}[model_name]
    if name == "resnet":
        return ResNet18(num_classes, dtype=dtype, freeze_prefix=freeze_prefix)
    if name == "vgg":
        return VGG16(num_classes, dtype=dtype, freeze_prefix=freeze_prefix)
    if name == "mobilenet":
        return MobileNetV2(num_classes, dtype=dtype, freeze_prefix=freeze_prefix)
    if name == "custom":
        return CustomCNN(num_classes, dtype=dtype)
    return EnsembleClassifier(num_classes, dtype=dtype, freeze_prefix=freeze_prefix)


def trainable_mask(params, model_name: str):
    """Reference layer-freeze policy (helpers.py:317-345) as a bool pytree.

    resnet: layer4 + fc; vgg: last two convs (torch features.26/.28) +
    classifier; mobilenet: features.17/.18 + classifier; custom: everything;
    ensemble: the fusion head only (Classifiers.py freeze_layers).
    """
    name = {"resnet": "resnet", "resnet18": "resnet", "vgg": "vgg", "vgg16": "vgg",
            "mobilenet": "mobilenet", "mobilenet_v2": "mobilenet",
            "custom": "custom", "ensemble": "ensemble"}[model_name]

    def decide(path: tuple[str, ...]) -> bool:
        top = path[0] if path else ""
        if name == "custom":
            return True
        if name == "resnet":
            return top.startswith("layer4") or top == "fc"
        if name == "vgg":
            return top in ("conv_11", "conv_12") or top.startswith("classifier")
        if name == "mobilenet":
            return top in ("features_17", "features_18", "features_18_bn") or top == "classifier"
        if name == "ensemble":
            return top == "classifier"
        return True

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def mask_fn(path, _):
        keys = tuple(getattr(p, "key", getattr(p, "idx", "")) for p in path)
        return decide(tuple(str(k) for k in keys))

    return jax.tree_util.tree_map_with_path(mask_fn, params)
