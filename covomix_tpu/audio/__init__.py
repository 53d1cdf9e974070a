from covomix_tpu.audio.mel import MelConfig, mel_spectrogram, mel_filterbank, log_mel_floor
from covomix_tpu.audio.spec import get_window, istft, spec_back, spec_fwd, stft_complex
from covomix_tpu.audio.wav import load_wav, save_wav, resample

__all__ = [
    "MelConfig",
    "mel_spectrogram",
    "mel_filterbank",
    "log_mel_floor",
    "load_wav",
    "save_wav",
    "resample",
    "get_window",
    "istft",
    "spec_back",
    "spec_fwd",
    "stft_complex",
]
