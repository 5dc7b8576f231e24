"""Feature extraction CLI (reference make_spect.py + main.py:19-24).

Walks <wav_dir>/<speaker>/*.wav and writes <main_dir>/<model_type>/<speaker>/
<utt>.npy feature files. Default path is exact reference parity: scipy
filtfilt in float64 + per-speaker-seeded dither + float64 STFT/mel on CPU.
--device runs the float32 fused STFT+mel on the accelerator with shape
bucketing (throughput mode).

Usage: python -m autovc_tpu.cli.make_spect --main_dir DIR [--wav_dir DIR]
           [--model_type spmel|stft|wav|legacy] [--mic mic1] [--device]

'legacy' is the old-code 512-pt/257-bin magnitude pipeline
("old code/make_spect_old.py").
"""

from __future__ import annotations

import argparse
import os
import zlib

import numpy as np
import scipy.signal

from autovc_tpu.config import AudioConfig
from autovc_tpu.dsp.audio_io import read_wav
from autovc_tpu.dsp.filters import butter_highpass
from autovc_tpu.dsp.mel import mel_filterbank
from autovc_tpu.dsp.stft import hann_window


def _host_stft_mag(x: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    xp = np.pad(x, n_fft // 2, mode="reflect")
    t = (xp.shape[0] - (n_fft - hop)) // hop
    idx = np.arange(t)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = xp[idx] * hann_window(n_fft, np.float64)
    return np.abs(np.fft.rfft(frames, n=n_fft, axis=-1))


def extract_all(
    main_dir: str,
    wav_dir: str | None = None,
    model_type: str = "spmel",
    mic: str = "mic1",
    audio: AudioConfig = AudioConfig(),
    use_device: bool = False,
) -> list[str]:
    """Extract features for every speaker dir; returns written paths."""
    if wav_dir is None:
        for cand in ("wav48_silence_trimmed", "wavs", "wav"):
            p = os.path.join(main_dir, cand)
            if os.path.isdir(p):
                wav_dir = p
                break
        else:
            raise FileNotFoundError(f"no wav directory under {main_dir}")

    save_dir = os.path.join(main_dir, model_type)
    b, a = butter_highpass(audio.highpass_cutoff_hz, audio.sample_rate, audio.highpass_order)
    mel_basis = mel_filterbank(
        audio.sample_rate, audio.n_fft, audio.n_mels, audio.mel_fmin, audio.mel_fmax,
        dtype=np.float64,
    )
    min_level = 1e-5
    written = []

    if use_device:
        import jax
        import jax.numpy as jnp
        from autovc_tpu.dsp.features import MelFrontend

        fe = MelFrontend(audio, dtype=jnp.float32)

    speakers = sorted(
        d for d in os.listdir(wav_dir) if os.path.isdir(os.path.join(wav_dir, d))
    )
    for speaker in speakers:
        os.makedirs(os.path.join(save_dir, speaker), exist_ok=True)
        files = sorted(os.listdir(os.path.join(wav_dir, speaker)))
        # per-speaker seeded dither stream (make_spect.py:68); digit-less
        # speaker names (the reference assumes VCTK 'pNNN') hash to a stable
        # seed instead of crashing int('')
        digits = "".join(c for c in speaker if c.isdigit())
        seed = int(digits) if digits else zlib.crc32(speaker.encode()) % (2**31)
        prng = np.random.RandomState(seed)
        for fname in files:
            if mic in fname or not fname.endswith(".wav"):
                # skip the excluded microphone (make_spect.py:70)
                continue
            x, _ = read_wav(os.path.join(wav_dir, speaker, fname), audio.sample_rate)
            noise = (prng.rand(x.shape[0]) - 0.5) * 1e-6

            if use_device:
                # the frontend owns the whole chain (highpass -> *0.96 +
                # dither -> features); hand it the RAW wav + host dither
                # stream — pre-filtering here would apply the highpass twice
                s = np.asarray(
                    fe.extract(
                        model_type, jnp.asarray(x, jnp.float32),
                        noise=jnp.asarray(noise, jnp.float32),
                    )
                )
            else:
                # host chain (make_spect.py:74-76): highpass -> *0.96 + dither
                wav = scipy.signal.filtfilt(b, a, x.astype(np.float64)) * 0.96 + noise
                if model_type == "spmel":
                    d = _host_stft_mag(wav, audio.n_fft, audio.hop_length)
                    m = d @ mel_basis
                    db = 20 * np.log10(np.maximum(min_level, m)) - audio.ref_level_db
                    s = np.clip((db + 100) / 100, 0, 1)
                elif model_type in ("stft", "legacy"):
                    # 'legacy' is the 512-pt/257-bin old-code pipeline
                    # ("old code/make_spect_old.py":19), same dB chain
                    n_fft = audio.n_fft if model_type == "stft" else audio.legacy_n_fft
                    d = _host_stft_mag(wav, n_fft, audio.hop_length)
                    db = 20 * np.log10(np.maximum(min_level, d)) - audio.ref_level_db
                    s = np.clip((db + 100) / 100, 0, 1)
                elif model_type == "wav":
                    med = np.median(wav)
                    lo, hi = np.percentile(wav, audio.robust_quantile_range)
                    s = ((wav - med) / (hi - lo)).reshape(-1, 1)
                else:
                    raise ValueError(f"unknown model_type {model_type!r}")

            out = os.path.join(save_dir, speaker, fname[: fname.rfind(".")] + ".npy")
            np.save(out, np.asarray(s, np.float32), allow_pickle=False)
            written.append(out)
        print(f"[make_spect] {speaker}: done")
    return written


def main(argv=None):
    from autovc_tpu.cli._common import add_platform_arg, apply_platform

    ap = argparse.ArgumentParser(description=__doc__)
    add_platform_arg(ap)
    ap.add_argument("--main_dir", required=True)
    ap.add_argument("--wav_dir", default=None)
    ap.add_argument(
        "--model_type", default="spmel", choices=["spmel", "stft", "wav", "legacy"]
    )
    ap.add_argument("--mic", default="mic1", help="microphone substring to EXCLUDE")
    ap.add_argument("--device", action="store_true", help="float32 accelerator path")
    args = ap.parse_args(argv)
    apply_platform(args)
    extract_all(args.main_dir, args.wav_dir, args.model_type, args.mic, use_device=args.device)


if __name__ == "__main__":
    main()
