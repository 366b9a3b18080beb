"""Compute several classifier-feature FID pairs in ONE process.

Each fresh python process pays the axon worker's per-process session tax
(tens of seconds to tens of minutes as worker state accumulates — see
.claude/skills/verify). cli.fid is one pair per process; this helper loads
the feature classifier once and scores every requested pair, caching
features per directory.

  python tools/fid_batch.py --classifier_ckpt results/ckpt_custom_synth0 \
      --num_classes 27 --limit 540 \
      floor:datasets/val:datasets/train dpmpp:datasets/val:gen_images
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--classifier_ckpt", required=True)
    p.add_argument("--classifier_model", default="custom")
    p.add_argument("--num_classes", type=int, default=27)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("pairs", nargs="+", metavar="NAME:DIR1:DIR2")
    a = p.parse_args(argv)

    from spectrogramgenai_tpu.cli.fid import classifier_features
    from spectrogramgenai_tpu.cli.inception_score import load_images
    from spectrogramgenai_tpu.eval.inception import frechet_distance, gaussian_statistics

    stats: dict[str, tuple] = {}

    def stats_of(d: str):
        if d not in stats:
            feats = classifier_features(load_images(d, a.limit), a)
            stats[d] = (*gaussian_statistics(feats), len(feats))
        return stats[d]

    failures = 0
    for spec in a.pairs:
        try:
            name, d1, d2 = spec.split(":")
            mu1, s1, n1 = stats_of(d1)
            mu2, s2, n2 = stats_of(d2)
            print(f"FID[{name}] ({a.classifier_model} logit space): "
                  f"{frechet_distance(mu1, s1, mu2, s2):.4f}  (n1={n1}, n2={n2})",
                  flush=True)
        except Exception as e:
            failures += 1
            print(f"FID[{spec}] FAILED: {type(e).__name__}: {e}", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
