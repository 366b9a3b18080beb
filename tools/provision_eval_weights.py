"""One-command evaluator-weights bring-up: fetch/convert/verify/install.

The reference scores generations with pretrained evaluators out of the box —
torchvision inception_v3 for IS/FID (reference inception_score.py:32-47,
README.md:58-62) and laion-clap for FAD (reference fad.py:11-21) — and
fine-tunes ImageNet resnet18/vgg16/mobilenet_v2 (helpers.py:314-358). This
image has no pretrained weights and no network egress, so the BASELINE
"FID/FAD within 1%" contract stays open until weights are reachable. This
tool closes it the day they are, in one command:

  python tools/provision_eval_weights.py --out_dir models/eval \
      --inception_v3 https://download.pytorch.org/models/inception_v3_google-0cc3c7bd.pth \
      --resnet18    https://download.pytorch.org/models/resnet18-f37072fd.pth \
      --vgg16       https://download.pytorch.org/models/vgg16-397923af.pth \
      --mobilenet_v2 https://download.pytorch.org/models/mobilenet_v2-b0353104.pth \
      --clap        /path/to/clap-htsat-unfused/pytorch_model.bin

Per source (local path or URL) it:
  1. loads the torch state_dict (downloading first if a URL),
  2. converts it with the existing golden-tested converters
     (tools/convert_torchvision.py, tools/convert_clap.py),
  3. VERIFIES the conversion by loading the same state_dict into the torch
     oracle architecture (tests/torch_refs.py for torchvision; HF
     transformers ClapAudioModelWithProjection for CLAP) and asserting
     forward parity on a fixed input,
  4. installs ``<out_dir>/<name>.msgpack`` and records its sha256 +
     max-abs forward error in ``<out_dir>/manifest.json``.

Afterwards, score a folder pair end to end with:

  python -m spectrogramgenai_tpu.cli.verify_metrics \
      --real_dir datasets/val_flat --gen_dir gen_images --weights_dir models/eval

Any subset of models may be provisioned; each flag is independent.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)
for p in (_ROOT, _HERE, os.path.join(_ROOT, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)

TORCHVISION_MODELS = ("inception_v3", "resnet18", "vgg16", "mobilenet_v2")


def _fetch(src: str, workdir: str) -> str:
    """Return a local path for `src`, downloading it first if it is a URL."""
    if src.startswith(("http://", "https://")):
        import urllib.request

        dest = os.path.join(workdir, os.path.basename(src) or "weights.pth")
        print(f"downloading {src} → {dest}")
        urllib.request.urlretrieve(src, dest)
        return dest
    if not os.path.exists(src):
        raise FileNotFoundError(src)
    return src


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _load_state_dict(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):  # a whole module was pickled
        sd = sd.state_dict()
    return {k: v for k, v in sd.items() if hasattr(v, "numpy")}


# -- torchvision models -------------------------------------------------------

def _verify_torchvision(name: str, sd: dict, variables: dict, num_classes: int,
                        img_size: int) -> float:
    """Forward-parity check: torch oracle (same state_dict) vs flax
    (converted tree). Returns the max-abs logit error."""
    import torch
    from torch_refs import TorchInceptionV3, TorchMobileNetV2, TorchResNet18, TorchVGG16

    import jax
    import jax.numpy as jnp

    from spectrogramgenai_tpu.eval.inception import InceptionV3
    from spectrogramgenai_tpu.models.classifiers import MobileNetV2, ResNet18, VGG16

    torch_cls = {"inception_v3": TorchInceptionV3, "resnet18": TorchResNet18,
                 "vgg16": TorchVGG16, "mobilenet_v2": TorchMobileNetV2}[name]
    flax_model = {"inception_v3": lambda: InceptionV3(num_classes=num_classes),
                  "resnet18": lambda: ResNet18(num_classes=num_classes),
                  "vgg16": lambda: VGG16(num_classes=num_classes),
                  "mobilenet_v2": lambda: MobileNetV2(num_classes=num_classes)}[name]()

    tm = torch_cls(num_classes=num_classes).eval()
    # strict=False: real torchvision state_dicts carry keys the oracle omits
    # (AuxLogits.*, num_batches_tracked); anything MISSING is a hard error.
    missing, unexpected = tm.load_state_dict(
        {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()}, strict=False)
    if missing:
        raise ValueError(f"{name}: state_dict is missing oracle keys: {missing[:5]}")
    benign = [k for k in unexpected
              if not (k.startswith("AuxLogits.") or k.endswith("num_batches_tracked"))]
    if benign:
        raise ValueError(f"{name}: unexpected state_dict keys: {benign[:5]}")

    x = np.random.default_rng(7).uniform(-1, 1, (2, img_size, img_size, 3)).astype(np.float32)
    with torch.inference_mode():
        want = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = np.asarray(flax_model.apply(jax.device_get(variables), jnp.asarray(x), train=False))
    err = float(np.max(np.abs(got - want)))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3)
    return err


def provision_torchvision(name: str, src_path: str, out_dir: str, *,
                          num_classes: int = 1000, img_size: int = 96,
                          verify: bool = True) -> dict:
    from flax import serialization

    from convert_torchvision import CONVERTERS

    sd = {k: v.numpy() for k, v in _load_state_dict(src_path).items()}
    variables = CONVERTERS[name](sd)
    entry = {"source": src_path, "source_sha256": _sha256(src_path)}
    if verify:
        entry["max_abs_forward_err"] = _verify_torchvision(
            name, sd, variables, num_classes, img_size)
    out_path = os.path.join(out_dir, f"{name}.msgpack")
    with open(out_path, "wb") as f:
        f.write(serialization.to_bytes(variables))
    entry["path"] = out_path
    entry["sha256"] = _sha256(out_path)
    return entry


# -- CLAP ---------------------------------------------------------------------

def _verify_clap(sd_numpy: dict, variables: dict) -> float:
    """Forward-parity vs HF transformers' torch CLAP audio branch (the
    canonical laion-clap port, default HTSAT-tiny config)."""
    import torch
    from transformers.models.clap.configuration_clap import ClapAudioConfig
    from transformers.models.clap.modeling_clap import ClapAudioModelWithProjection

    import jax.numpy as jnp

    from spectrogramgenai_tpu.eval.clap import ClapAudioTower, ClapAudioTowerConfig

    hf = ClapAudioModelWithProjection(ClapAudioConfig(enable_fusion=False)).eval()
    prefixed = {}
    for k, v in sd_numpy.items():
        t = torch.as_tensor(np.asarray(v))
        if k.startswith(("audio_model.", "audio_projection.")):
            prefixed[k] = t
        elif k.startswith("audio_encoder."):
            prefixed["audio_model." + k] = t
        elif k.startswith("proj."):
            prefixed["audio_projection." + k[len("proj."):]] = t
    missing, _unexpected = hf.load_state_dict(prefixed, strict=False)
    real_missing = [k for k in missing if not k.endswith("num_batches_tracked")]
    if real_missing:
        raise ValueError(f"clap: state_dict missing audio-branch keys: {real_missing[:5]}")

    cfg = ClapAudioTowerConfig()
    feats = np.random.default_rng(11).standard_normal(
        (1, 1, cfg.num_mel_bins, 1001)).astype(np.float32) * 0.3
    with torch.inference_mode():
        want = hf(torch.from_numpy(np.transpose(feats, (0, 1, 3, 2)))).audio_embeds.numpy()
    tower = ClapAudioTower(cfg)
    got = np.asarray(tower.apply(variables, jnp.asarray(np.transpose(feats, (0, 1, 3, 2)))))
    err = float(np.max(np.abs(got - want)))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3)
    return err


def provision_clap(src_path: str, out_dir: str, *, verify: bool = True) -> dict:
    from flax import serialization

    from convert_clap import convert_clap_audio

    sd = {k: v.numpy() for k, v in _load_state_dict(src_path).items()}
    variables = convert_clap_audio(sd)
    entry = {"source": src_path, "source_sha256": _sha256(src_path)}
    if verify:
        entry["max_abs_forward_err"] = _verify_clap(sd, variables)
    out_path = os.path.join(out_dir, "clap_audio.msgpack")
    with open(out_path, "wb") as f:
        f.write(serialization.to_bytes(variables))
    entry["path"] = out_path
    entry["sha256"] = _sha256(out_path)
    return entry


# -- driver -------------------------------------------------------------------

def provision(sources: dict[str, str], out_dir: str, *, verify: bool = True,
              num_classes: int = 1000, img_size: int = 96) -> dict:
    """Convert+verify+install every (name → path/URL) in `sources`.

    Returns the manifest dict (also written to <out_dir>/manifest.json).
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "manifest.json")
    manifest = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)

    with tempfile.TemporaryDirectory() as tmp:
        for name, src in sources.items():
            local = _fetch(src, tmp)
            print(f"provisioning {name} from {local} …")
            if name == "clap":
                entry = provision_clap(local, out_dir, verify=verify)
            else:
                entry = provision_torchvision(name, local, out_dir, verify=verify,
                                              num_classes=num_classes, img_size=img_size)
            entry["verified"] = verify
            manifest[name] = entry
            err = entry.get("max_abs_forward_err")
            print(f"  ok: {entry['path']}  sha256={entry['sha256'][:12]}…"
                  + (f"  max_abs_err={err:.2e}" if err is not None else "  (unverified)"))

    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"manifest → {manifest_path}")
    return manifest


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    for name in TORCHVISION_MODELS:
        p.add_argument(f"--{name}", default=None, metavar="PATH_OR_URL")
    p.add_argument("--clap", default=None, metavar="PATH_OR_URL",
                   help="HF laion/clap-htsat-unfused state_dict (pytorch_model.bin)")
    p.add_argument("--out_dir", default="models/eval")
    p.add_argument("--skip_verify", action="store_true",
                   help="skip the torch forward-parity check (not recommended)")
    p.add_argument("--num_classes", type=int, default=1000,
                   help="classifier head width of the provided state_dicts "
                        "(1000 for stock torchvision; override for test dicts)")
    p.add_argument("--img_size", type=int, default=96,
                   help="verification forward input size")
    a = p.parse_args(argv)

    sources = {name: getattr(a, name) for name in (*TORCHVISION_MODELS, "clap")
               if getattr(a, name)}
    if not sources:
        p.error("no sources given — pass at least one of "
                + ", ".join(f"--{n}" for n in (*TORCHVISION_MODELS, "clap")))
    provision(sources, a.out_dir, verify=not a.skip_verify,
              num_classes=a.num_classes, img_size=a.img_size)


if __name__ == "__main__":
    main()
