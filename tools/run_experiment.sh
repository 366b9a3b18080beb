#!/usr/bin/env bash
# The reference's science loop in miniature, end-to-end on real TPU
# (reference train_classifiers.py:9-83 + postprocessing/analyse_results.R):
#   synthetic corpus → gen_specs → VQ-VAE → latent DDPM → conditional
#   generation → classifier sweep over synthetic-per-class → aggregate
#   table + accuracy-vs-synthetic plot.
# Results are summarized in docs/EXPERIMENT.md. Run from the repo root:
#   bash tools/run_experiment.sh [workdir]
# Each phase is idempotent-ish (gen_specs skips existing; trainers resume
# from checkpoints), so a crashed run can be re-invoked.
set -euo pipefail

REPO=$(cd "$(dirname "$0")/.." && pwd)
WORK=${1:-$REPO/.exp}
export PYTHONPATH="$REPO:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"
cd "$WORK"

phase() { echo; echo "=== [$(date +%H:%M:%S)] $* ==="; }

phase "0. corpus (skipped if present)"
# val/test are drawn at much lower SNR than train (−12..2 vs 3..18 dB): with
# the same range everywhere a 27-way CNN saturates at val_acc 1.0 on 10
# train/class and the synthetic-count sweep has no headroom to move.
[ -d wavs ] || python "$REPO/tools/make_experiment_dataset.py" --out . \
    --classes 27 --train_per_class 10 --val_per_class 6 --test_per_class 6 --seed 0 \
    --val_snr=-12,2 --test_snr=-12,2

phase "1. wav -> 256x256 log-mel PNGs (fused Pallas mel kernel)"
for split in train val test; do
  python -m spectrogramgenai_tpu.cli.gen_specs --manifest "manifest_$split.csv" \
      --wav_dir wavs --out_dir pngs
done
python "$REPO/tools/make_experiment_dataset.py" --out . --arrange pngs --datasets_dir datasets

phase "2. VQ-VAE (full-size: hidden 512, 512-codebook EMA)"
python -m spectrogramgenai_tpu.cli.train_vqvae --data.dataset_path datasets \
    --epochs 60 --run.run_name exp_vqvae --run.log_every 20

phase "3a. latent DDPM (full-size UNet, 1000-step schedule, CFG training)"
python -m spectrogramgenai_tpu.cli.train_ddpm --data.dataset_path datasets \
    --data.batch_size 32 --epochs 600 --vqae_ckpt models/exp_vqvae \
    --run.run_name exp_ddpm --log_every_epoch 100 --run.ckpt_every_epochs 100 \
    --run.log_every 40

phase "3b. extend to 28.8k steps (resume; no per-epoch val, gentler peak lr)"
# 4.8k steps produces recognizable calls for only a minority of classes
# (chain sampler) and near-noise from dpmpp-20 — a 1000-step DDPM on this
# corpus needs tens of thousands of steps. The trainer resumes exactly
# (state.step is the position; same shuffle stream).
python -m spectrogramgenai_tpu.cli.train_ddpm --data.dataset_path datasets \
    --data.batch_size 32 --epochs 3600 --vqae_ckpt models/exp_vqvae \
    --run.run_name exp_ddpm --log_every_epoch 600 --run.ckpt_every_epochs 600 \
    --run.log_every 200 --do_validation false --lr 2e-3

phase "4a. conditional generation: 50/class via dpmpp-20 (measured serving default)"
python -m spectrogramgenai_tpu.cli.generate --run.run_name exp_ddpm \
    --img_folder gen_images --num_samples 50 --sampler dpmpp --num_steps 20 \
    --vqae_ckpt models/exp_vqvae --train_folder_for_classes datasets/train

phase "4b. parity cross-check: 20 rounds via the 999-step DDPM chain"
python -m spectrogramgenai_tpu.cli.generate --run.run_name exp_ddpm \
    --img_folder gen_images_chain --num_samples 20 --sampler ddpm \
    --vqae_ckpt models/exp_vqvae --train_folder_for_classes datasets/train

phase "5. classifier sweep: {custom, resnet18} x {0,10,25,50} synthetic/class"
python -m spectrogramgenai_tpu.cli.train_classifiers --train_dir datasets/train \
    --val_dir datasets/val --test_dir datasets/test --gen_dir gen_images \
    --models custom,resnet --synths 0,10,25,50 --run.output_dir results

phase "5b. generative quality: classifier-feature FID (real val vs dpmpp-20 vs 999-chain)"
# Domain-relevant FID in the trained synth0-classifier's logit space
# (ImageNet Inception weights are unreachable in this sealed image —
# PARITY.md egress log; the converter + golden tests cover that path).
# one process for all four pairs: each fresh python process pays the axon
# worker session tax (tools/fid_batch.py caches per-dir features too)
{
  echo "## FID (custom synth0 classifier logit space), lower is better"
  python "$REPO/tools/fid_batch.py" --classifier_ckpt results/ckpt_custom_synth0 \
      --num_classes 27 --limit 540 \
      floor_val_vs_train:datasets/val:datasets/train \
      val_vs_dpmpp20:datasets/val:gen_images \
      val_vs_chain999:datasets/val:gen_images_chain \
      sampler_gap:gen_images_chain:gen_images
} | tee results/quality_metrics.txt

phase "6. aggregate: best-val-epoch table + accuracy-vs-synthetic plot + LaTeX"
python "$REPO/postprocessing/analyse_results.py" --results_dir results \
    --out_dir results/analysis
cat results/analysis/aggregate_results.csv

phase "done"
