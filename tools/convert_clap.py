"""Convert a HuggingFace CLAP audio-branch state_dict → flax ClapAudioTower.

The reference scores FAD with laion-clap "630k-audioset" (reference
fad.py:11-21). HF ships that checkpoint as ``laion/clap-htsat-unfused``
(ClapModel / ClapAudioModelWithProjection). Wherever those weights exist:

  python tools/convert_clap.py --state_dict pytorch_model.bin \\
      --out models/clap_audio.msgpack

The output loads via spectrogramgenai_tpu.eval.clap.load_clap_params and
drives the TPU CLAP-FAD path (cli/fad.py --clap_ckpt).

Accepts state_dicts from ClapModel, ClapAudioModelWithProjection (standard
``audio_model.audio_encoder.`` / ``audio_projection.`` prefixes), or a bare
ClapAudioModel plus separate projection. Conversion fidelity is golden-tested
against the HF torch forward in tests/test_clap_golden.py.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def t_conv(w):  # OIHW → HWIO
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def t_linear(w):  # (out, in) → (in, out)
    return np.transpose(np.asarray(w), (1, 0))


def _ln(sd, key):
    return {"scale": np.asarray(sd[f"{key}.weight"]), "bias": np.asarray(sd[f"{key}.bias"])}


def _dense(sd, key):
    return {"kernel": t_linear(sd[f"{key}.weight"]), "bias": np.asarray(sd[f"{key}.bias"])}


def convert_clap_audio(sd: dict, depths=(2, 2, 6, 2)) -> dict:
    """HF CLAP state_dict (numpy values) → {"params": …, "batch_stats": …}."""
    # normalize prefixes: audio_model.audio_encoder.X → X, audio_projection.Y → proj.Y
    norm = {}
    for k, v in sd.items():
        if k.startswith("audio_model.audio_encoder."):
            norm[k[len("audio_model.audio_encoder."):]] = v
        elif k.startswith("audio_encoder."):
            norm[k[len("audio_encoder."):]] = v
        elif k.startswith("audio_projection."):
            norm["proj." + k[len("audio_projection."):]] = v
        else:
            norm[k] = v
    sd = norm

    params: dict = {}
    stats: dict = {}

    params["batch_norm"] = {"scale": np.asarray(sd["batch_norm.weight"]),
                            "bias": np.asarray(sd["batch_norm.bias"])}
    stats["batch_norm"] = {"mean": np.asarray(sd["batch_norm.running_mean"]),
                           "var": np.asarray(sd["batch_norm.running_var"])}

    params["patch_embed_proj"] = {"kernel": t_conv(sd["patch_embed.proj.weight"]),
                                  "bias": np.asarray(sd["patch_embed.proj.bias"])}
    params["patch_embed_norm"] = _ln(sd, "patch_embed.norm")

    for i, depth in enumerate(depths):
        for j in range(depth):
            src = f"layers.{i}.blocks.{j}"
            attn = {
                "query": _dense(sd, f"{src}.attention.self.query"),
                "key": _dense(sd, f"{src}.attention.self.key"),
                "value": _dense(sd, f"{src}.attention.self.value"),
                "out": _dense(sd, f"{src}.attention.output.dense"),
                "relative_position_bias_table": np.asarray(
                    sd[f"{src}.attention.self.relative_position_bias_table"]),
            }
            params[f"layers_{i}_blocks_{j}"] = {
                "layernorm_before": _ln(sd, f"{src}.layernorm_before"),
                "attention": attn,
                "layernorm_after": _ln(sd, f"{src}.layernorm_after"),
                "intermediate": _dense(sd, f"{src}.intermediate.dense"),
                "output": _dense(sd, f"{src}.output.dense"),
            }
        if i < len(depths) - 1:
            params[f"layers_{i}_downsample"] = {
                "norm": _ln(sd, f"layers.{i}.downsample.norm"),
                "reduction": {"kernel": t_linear(sd[f"layers.{i}.downsample.reduction.weight"])},
            }

    params["norm"] = _ln(sd, "norm")
    params["linear1"] = _dense(sd, "proj.linear1")
    params["linear2"] = _dense(sd, "proj.linear2")
    return {"params": params, "batch_stats": stats}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--state_dict", required=True, help="HF CLAP .bin/.pt state_dict")
    p.add_argument("--out", required=True, help="output .msgpack path")
    p.add_argument("--depths", default="2,2,6,2")
    a = p.parse_args(argv)

    import torch
    from flax import serialization

    sd = torch.load(a.state_dict, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    depths = tuple(int(d) for d in a.depths.split(","))
    variables = convert_clap_audio(sd, depths=depths)

    def _leaves(tree):
        for v in tree.values():
            if isinstance(v, dict):
                yield from _leaves(v)
            else:
                yield v

    with open(a.out, "wb") as f:
        f.write(serialization.to_bytes(variables))
    n = sum(v.size for v in _leaves(variables))
    print(f"converted CLAP audio tower: {n / 1e6:.1f}M params → {a.out}")


if __name__ == "__main__":
    main()
