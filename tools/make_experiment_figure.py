"""Assemble the docs/experiment comparison figure: rows = species, columns =
real spectrogram | 999-chain sample | dpmpp-20 sample (one PNG, no matplotlib
dependency on fonts — pure PIL tiling with small labels).

  python tools/make_experiment_figure.py --exp .exp --classes 0,1,12,22 \
      --out docs/experiment/real_vs_generated.png
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np
from PIL import Image, ImageDraw

TILE = 192
PAD = 6
LABEL_H = 18


def first(pattern: str) -> str:
    matches = sorted(glob.glob(pattern))
    if not matches:
        raise FileNotFoundError(pattern)
    return matches[0]


def tile(path: str) -> Image.Image:
    return Image.open(path).convert("RGB").resize((TILE, TILE), Image.BILINEAR)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp", required=True, help="experiment workdir (tools/run_experiment.sh)")
    p.add_argument("--classes", default="0,1,12,22")
    p.add_argument("--chain_dir", default="gen_images_chain")
    p.add_argument("--dpmpp_dir", default="gen_images")
    p.add_argument("--out", required=True)
    a = p.parse_args(argv)

    cls = [int(c) for c in a.classes.split(",")]
    cols = ["real (train)", "999-chain sample", "dpmpp-20 sample"]
    W = PAD + len(cols) * (TILE + PAD)
    H = LABEL_H + PAD + len(cls) * (TILE + PAD)
    canvas = Image.new("RGB", (W, H), (255, 255, 255))
    draw = ImageDraw.Draw(canvas)

    for j, name in enumerate(cols):
        draw.text((PAD + j * (TILE + PAD) + 4, 3), name, fill=(0, 0, 0))

    for i, ci in enumerate(cls):
        cname = f"species{ci:02d}"
        paths = [
            first(os.path.join(a.exp, "datasets", "train", cname, "*.png")),
            first(os.path.join(a.exp, a.chain_dir, f"{cname}_gen_imgs_*_0.png")),
            first(os.path.join(a.exp, a.dpmpp_dir, f"{cname}_gen_imgs_*_0.png")),
        ]
        y = LABEL_H + PAD + i * (TILE + PAD)
        for j, path in enumerate(paths):
            canvas.paste(tile(path), (PAD + j * (TILE + PAD), y))
        draw.text((PAD + 4, y + 4), cname, fill=(255, 255, 255))

    os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
    canvas.save(a.out)
    arr = np.asarray(canvas)
    print(f"wrote {a.out} ({arr.shape[1]}x{arr.shape[0]})")


if __name__ == "__main__":
    main()
