"""Mint 513-bin stft-variant feature goldens from the reference pipeline.

The reference bundles spmel goldens only; its stft branch
(make_spect.py:86-88) was never exercised against bundled fixtures. This
script runs the reference's OWN code (imported read-only as an oracle —
`Spect.pySTFT` / `Spect.butter_highpass`) over bundled wavs with the exact
per-speaker dither-stream accounting, and stores the resulting (513, T)
arrays — the reference saves the stft variant UNTRANSPOSED, unlike spmel's
(T, 80) — under tests/goldens/stft_ref/ for test_golden_stft_parity.

Run once on CPU: python scripts/mint_stft_goldens.py
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
from scipy import signal

REF = "/root/reference"
UTTS = [("p001", "p001_003"), ("p225", "p225_003"), ("p228", "p228_003")]
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens", "stft_ref")


def load_reference_spect():
    # librosa/soundfile are not installed here; stub them so the module
    # imports — we only call Spect.pySTFT / Spect.butter_highpass, which
    # are pure numpy/scipy. Only freshly-created stubs are mutated: a real
    # installed librosa must not have its attributes clobbered.
    for name in ("soundfile", "librosa", "librosa.filters"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                sys.modules[name] = types.ModuleType(name)
                sys.modules[name]._stub = True
    if getattr(sys.modules["librosa.filters"], "_stub", False):
        sys.modules["librosa.filters"].mel = lambda *a, **k: None
    if getattr(sys.modules["librosa"], "_stub", False):
        sys.modules["librosa"].filters = sys.modules["librosa.filters"]
    sys.path.insert(0, REF)
    try:
        from make_spect import Spect
    finally:
        sys.path.remove(REF)
    cfg = types.SimpleNamespace(speaker_embed=None, model_type="stft", main_dir="/tmp")
    return Spect(cfg)


def main():
    sp = load_reference_spect()
    b, a = sp.butter_highpass()
    min_level = np.exp(-100 / 20 * np.log(10))
    os.makedirs(OUT_DIR, exist_ok=True)

    from autovc_tpu.dsp.audio_io import read_wav

    for speaker, utt in UTTS:
        wav_dir = os.path.join(REF, "wavs", speaker)
        prng = np.random.RandomState(int(speaker[1:]))
        golden = None
        for fname in sorted(os.listdir(wav_dir)):
            # the reference processes every file in sorted order, advancing
            # the dither stream per file (make_spect.py:70-78).
            # librosa.load(sr=16000) on these 16 kHz int16 wavs is an exact
            # float32 cast of sample/32768 — reproduced via read_wav.
            x_f64, sr = read_wav(os.path.join(wav_dir, fname))
            assert sr == sp.fs
            x = x_f64.astype(np.float32)
            y = signal.filtfilt(b, a, x)
            wav = y * 0.96 + (prng.rand(y.shape[0]) - 0.5) * 1e-06
            if fname == utt + ".wav":
                D = sp.pySTFT(wav)  # (513, T) — reference keeps bins-major
                D_db = 20 * np.log10(np.maximum(min_level, D)) - 16
                golden = np.clip((D_db + 100) / 100, 0, 1).astype(np.float32)
                # also store the filtered+dithered waveform (float32) so the
                # STFT+dB stage can be gated TIGHT on identical input: two
                # independent IIR implementations drift ~1e-7 over a 100k-
                # sample recurrence (poles near z=1), which log-amplifies in
                # near-silent bins — the full-chain gate must be tiered, but
                # the branch-specific stage need not be.
                wav_f32 = wav.astype(np.float32)
                D2 = sp.pySTFT(wav_f32.astype(np.float64))
                D2_db = 20 * np.log10(np.maximum(min_level, D2)) - 16
                golden_iso = np.clip((D2_db + 100) / 100, 0, 1).astype(np.float32)
                break
        assert golden is not None, f"{utt}.wav not found in {wav_dir}"
        out = os.path.join(OUT_DIR, utt + ".npz")
        np.savez_compressed(out, stft=golden, wav=wav_f32, stft_iso=golden_iso)
        print(f"minted {out} stft={golden.shape} wav={wav_f32.shape}")


if __name__ == "__main__":
    main()
