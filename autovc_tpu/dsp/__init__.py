"""DSP / feature-extraction layer (reference L1: make_spect.py).

Everything here is built from first principles (no librosa/soundfile in this
environment): Slaney mel filterbank, periodic-Hann STFT, scipy-compatible
zero-phase Butterworth highpass as a bidirectional lax.scan, dB normalization,
robust waveform scaling, iSTFT and Griffin-Lim reconstruction.
"""

from autovc_tpu.dsp.mel import mel_filterbank, hz_to_mel, mel_to_hz
from autovc_tpu.dsp.stft import (
    hann_window,
    frame_signal,
    stft_magnitude,
    stft_complex,
    istft,
    griffin_lim,
)
from autovc_tpu.dsp.filters import (
    butter_highpass,
    butter_highpass_sos,
    lfilter,
    lfilter_zi,
    filtfilt,
    sos_filtfilt,
)
from autovc_tpu.dsp.features import (
    normalize_db,
    denormalize_db,
    robust_scale,
    dither_reference,
    mel_from_stft_mag,
    MelFrontend,
)
from autovc_tpu.dsp.audio_io import read_wav, write_wav

__all__ = [
    "mel_filterbank",
    "hz_to_mel",
    "mel_to_hz",
    "hann_window",
    "frame_signal",
    "stft_magnitude",
    "stft_complex",
    "istft",
    "griffin_lim",
    "butter_highpass",
    "butter_highpass_sos",
    "lfilter",
    "lfilter_zi",
    "filtfilt",
    "sos_filtfilt",
    "normalize_db",
    "denormalize_db",
    "robust_scale",
    "dither_reference",
    "mel_from_stft_mag",
    "MelFrontend",
    "read_wav",
    "write_wav",
]
