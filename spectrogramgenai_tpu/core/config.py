"""Typed configuration layer: one dataclass per workload + CLI overrides.

Replaces the reference's per-script SimpleNamespace/argparse mix
(train_ddpm.py:18-66, train_acgan.py:20-29, spec_vae.py:15-34,
train_classifiers.py:10-22) with a single registry. Defaults reproduce the
reference workloads exactly (BASELINE.md parity table).
"""

from __future__ import annotations

import argparse
import dataclasses
import types
import typing

from spectrogramgenai_tpu.audio.spectrogram import SpectrogramConfig


@dataclasses.dataclass(frozen=True)
class RunConfig:
    run_name: str = "run"
    output_dir: str = "results"
    seed: int = 42
    log_every: int = 50
    ckpt_every_epochs: int = 10
    mesh_data: int = -1  # -1 = all devices
    mesh_model: int = 1
    # parameter/optimizer-state sharding over the mesh (train/common.py
    # SHARD_MODES): "tp" (default), "fsdp" (ZeRO-3 style over the data
    # axis), "tp_fsdp", or "replicate".
    param_sharding: str = "tp"
    use_wandb: bool = False


@dataclasses.dataclass(frozen=True)
class DataConfig:
    dataset_path: str = "datasets"
    train_folder: str = "train"
    val_folder: str = "val"
    img_size: int = 256
    batch_size: int = 10          # train_ddpm.py:31
    slice_size: int = 1
    num_workers: int = 4
    bootstrap_balance: bool = True  # BootstrappedImageFolder semantics (diff_utils.py:80-111)
    # Decoded-image RAM cache: multi-epoch runs decode each PNG once instead
    # of once per epoch (415 img/s/core native decode hard-caps classifier
    # training on decode-starved hosts). Auto-disables past the budget.
    cache_decoded: bool = True
    cache_budget_mb: int = 8192


@dataclasses.dataclass(frozen=True)
class DDPMConfig:
    """Conditional DDPM — pixel space or VQ-VAE latent space.

    Reference: diff_modules.py:370-442 (schedule/CFG), train_ddpm.py:18-44.
    """

    run: RunConfig = RunConfig(run_name="ddpm")
    data: DataConfig = DataConfig()
    epochs: int = 100
    noise_steps: int = 1000
    beta_start: float = 1e-4
    beta_end: float = 0.02
    img_size: int = 256
    num_classes: int = 27
    c_in: int = 1
    c_out: int = 1
    time_dim: int = 256
    remove_deep_conv: bool = False
    width_mult: float = 1.0  # dev/test shrink knob; 1.0 = reference UNet
    latent: bool = True            # DiffusionVAE is the working reference path
    latent_dim: int = 4
    latent_downscale: int = 4      # img_size // 4 (diff_modules.py:621)
    vqae_ckpt: str = "models/VQAE"
    vq_hidden_dim: int = 512       # must match the trained VQ-VAE (diff_modules.py:609)
    vq_n_embeddings: int = 512
    lr: float = 5e-3               # AdamW max_lr with OneCycle (diff_modules.py:551-557)
    adam_eps: float = 1e-5
    cfg_scale: float = 3.0
    label_drop: float = 0.1        # classifier-free guidance dropout (diff_modules.py:475)
    ema_beta: float = 0.995
    ema_start: int = 2000
    do_validation: bool = True
    log_every_epoch: int = 10
    preview_sampler: str = "ddim"  # mid-training sample grids use the fast
    # sampler (50 steps); final generation defaults to the parity DDPM chain.
    rounds_per_chain: int = 1      # generation rounds batched into one scan.
    # Measured on v5e-8 (1 chip): internal batch 54 (27 classes × CFG 2) is the
    # throughput sweet spot — the 4096-token d=16 attention scales
    # super-linearly with batch, so larger chains LOWER samples/sec.
    compute_dtype: str = "bfloat16"  # replaces fp16 autocast + GradScaler
    # Gradient accumulation: split each data.batch_size batch into this many
    # microbatches inside the jitted step (lax.scan) and apply ONE optimizer
    # update on the averaged grads — effective batches past the per-chip HBM
    # activation capacity (~32/chip for latent DDPM on 16 GB) at one
    # microbatch's activation memory. data.batch_size must be divisible by
    # grad_accum × mesh data size.
    grad_accum: int = 1
    # Latent caching (latent mode only): pre-encode the dataset once through
    # the frozen VQ encoder and train from cached latents — bit-identical
    # batches/updates (encode is frozen + deterministic, no stochastic
    # augmentation in the pipeline), but skips the in-step encode (22% of the
    # step at batch 32, tools/train_ablation.py) and all per-epoch PNG decode.
    cache_latents: bool = True


@dataclasses.dataclass(frozen=True)
class VQVAEConfig:
    """VQ-VAE with EMA codebook. Reference: spec_vae.py:15-34, diff_modules.py:220-367."""

    run: RunConfig = RunConfig(run_name="vqvae")
    data: DataConfig = DataConfig(batch_size=16)
    epochs: int = 10
    input_dim: int = 1
    hidden_dim: int = 512
    latent_dim: int = 4
    n_embeddings: int = 512
    commitment_cost: float = 0.25
    ema_decay: float = 0.999
    ema_eps: float = 1e-5
    lr: float = 2e-4
    compute_dtype: str = "bfloat16"
    grad_accum: int = 1  # microbatches per jitted step (train/common.py scan); ONE optimizer update on averaged grads


@dataclasses.dataclass(frozen=True)
class ACGANConfig:
    """ACGAN. Reference: train_acgan.py:16-344, gan_models.py."""

    run: RunConfig = RunConfig(run_name="acgan")
    data: DataConfig = DataConfig(batch_size=16)
    epochs: int = 200
    noise_dim: int = 64            # N_Z (train_acgan.py:109)
    num_classes: int = 27
    num_blocks: int = 4
    lr: float = 0.002              # RMSprop both nets (train_acgan.py:142)
    rmsprop_alpha: float = 0.99
    rmsprop_eps: float = 1e-8
    use_aind: bool = False
    n_ind: int = 11
    use_denoiser: bool = False
    sample_every: int = 100        # eval-noise grids every 100 batches
    compute_dtype: str = "bfloat16"
    grad_accum: int = 1  # microbatches per jitted step (train/common.py scan); ONE optimizer update on averaged grads


@dataclasses.dataclass(frozen=True)
class ClassifierConfig:
    """Classifier sweep. Reference: train_classifiers.py, helpers.py:581-929."""

    run: RunConfig = RunConfig(run_name="classifiers")
    data: DataConfig = DataConfig(batch_size=16)
    model_name: str = "custom"     # resnet|vgg|mobilenet|custom|ensemble
    num_classes: int = 27
    epochs: int = 25
    lr: float = 1e-3               # Adam (helpers.py:703)
    synthetic_per_class: int = 0   # sweep {0,50,100,150,200,250}
    synthetic_cap: int = 250       # only gen images with idx < 250 (helpers.py:610)
    knowledge_dist: bool = False
    kd_temperature: float = 3.0    # helpers.py:707
    kd_alpha: float = 0.7          # helpers.py:708
    use_denoiser: bool = False
    compute_dtype: str = "bfloat16"
    # grad_accum: the ensemble at effective batch 64 hard-crashed the 16 GB
    # chip without it — k microbatches per step fit it comfortably
    grad_accum: int = 1  # microbatches per jitted step (train/common.py scan); ONE optimizer update on averaged grads


@dataclasses.dataclass(frozen=True)
class SpecUNetConfig:
    """Source-separation / denoiser trainer. Reference helpers.py:1084-1181.

    mode="separate": mix → 2ch (noise, bird) — the specunet trainer.
    mode="denoise":  mix → 1ch noise — trains the transformer denoiser used
    as ``x − net(x)`` preprocessing (the reference's transformer_near ckpt).
    """

    run: RunConfig = RunConfig(run_name="specunet")
    data: DataConfig = DataConfig(batch_size=8)
    epochs: int = 100
    lr: float = 1e-3
    mode: str = "separate"
    compute_dtype: str = "bfloat16"
    grad_accum: int = 1  # microbatches per jitted step (train/common.py scan); ONE optimizer update on averaged grads


@dataclasses.dataclass(frozen=True)
class GenSpecsConfig:
    """Bulk wav→PNG spectrogram export. Reference gen_specs.py / birdnet_all_spec.py."""

    run: RunConfig = RunConfig(run_name="gen_specs")
    wav_dir: str = "Birdnet_conf_files"
    out_dir: str = "Birdnet_conf_files_images"
    manifest: str = "specdata.npz"
    batch_size: int = 64
    spectrogram: SpectrogramConfig = SpectrogramConfig()
    use_pallas: bool = True
    skip_existing: bool = True     # birdnet_all_spec.py:41-42 semantics


CONFIGS: dict[str, type] = {
    "ddpm": DDPMConfig,
    "vqvae": VQVAEConfig,
    "acgan": ACGANConfig,
    "classifier": ClassifierConfig,
    "specunet": SpecUNetConfig,
    "gen_specs": GenSpecsConfig,
}


def _flatten_fields(cls, prefix=""):
    hints = typing.get_type_hints(cls)
    for f in dataclasses.fields(cls):
        ftype = hints.get(f.name, f.type)
        origin = typing.get_origin(ftype)
        if origin is typing.Union or origin is types.UnionType:  # e.g. float | None
            args = [a for a in typing.get_args(ftype) if a is not type(None)]
            ftype = args[0] if args else str
        if dataclasses.is_dataclass(ftype):
            yield from _flatten_fields(ftype, prefix + f.name + ".")
        else:
            yield prefix + f.name, ftype


def add_config_args(parser: argparse.ArgumentParser, cls) -> None:
    """Expose every (nested) dataclass field as --dotted.path flags."""
    for path, ftype in _flatten_fields(cls):
        if ftype is bool:
            parser.add_argument(f"--{path}", type=lambda s: s.lower() in ("1", "true", "yes"), default=None)
        elif ftype in (int, float, str):
            parser.add_argument(f"--{path}", type=ftype, default=None)


def apply_overrides(cfg, args: argparse.Namespace):
    """Return a copy of cfg with any non-None --dotted.path overrides applied."""

    def _apply(obj, path: list[str], value):
        name = path[0]
        if len(path) == 1:
            return dataclasses.replace(obj, **{name: value})
        return dataclasses.replace(obj, **{name: _apply(getattr(obj, name), path[1:], value)})

    for key, value in vars(args).items():
        if value is None or "." not in key and not hasattr(cfg, key):
            continue
        path = key.split(".")
        if hasattr(cfg, path[0]):
            cfg = _apply(cfg, path, value)
    return cfg


def parse_config(cls, argv=None):
    parser = argparse.ArgumentParser()
    add_config_args(parser, cls)
    args = parser.parse_args(argv)
    return apply_overrides(cls(), args)
