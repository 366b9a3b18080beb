from spectrogramgenai_tpu.models.unet import UNet, ConditionalUNet
from spectrogramgenai_tpu.models.vqvae import VQVAE, VQEncoder, VQDecoder, VQEmbeddingEMA
from spectrogramgenai_tpu.models.gan import Generator, Discriminator, CBAM
from spectrogramgenai_tpu.models.denoiser import TransformerDenoiser
from spectrogramgenai_tpu.models.classifiers import (
    CustomCNN,
    ResNet18,
    VGG16,
    MobileNetV2,
    EnsembleClassifier,
    build_classifier,
)

__all__ = [
    "UNet",
    "ConditionalUNet",
    "VQVAE",
    "VQEncoder",
    "VQDecoder",
    "VQEmbeddingEMA",
    "Generator",
    "Discriminator",
    "CBAM",
    "TransformerDenoiser",
    "CustomCNN",
    "ResNet18",
    "VGG16",
    "MobileNetV2",
    "EnsembleClassifier",
    "build_classifier",
]
