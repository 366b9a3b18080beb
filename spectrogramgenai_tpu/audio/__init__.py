from spectrogramgenai_tpu.audio.mel import hz_to_mel, mel_to_hz, mel_frequencies, mel_filterbank, hann_window
from spectrogramgenai_tpu.audio.spectrogram import (
    SpectrogramConfig,
    frame_signal,
    stft_power,
    mel_power_spectrogram,
    power_to_db,
    logmel_spectrogram,
    reference_logmel_np,
)

__all__ = [
    "hz_to_mel",
    "mel_to_hz",
    "mel_frequencies",
    "mel_filterbank",
    "hann_window",
    "SpectrogramConfig",
    "frame_signal",
    "stft_power",
    "mel_power_spectrogram",
    "power_to_db",
    "logmel_spectrogram",
    "reference_logmel_np",
]
