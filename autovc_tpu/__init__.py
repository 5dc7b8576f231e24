"""autovc_tpu — TPU-native JAX voice-conversion framework.

A from-scratch rebuild of the capabilities of the AutoVC reference
(sebakeaaen/autovc): DSP feature extraction, the content-bottleneck
autoencoder family (mel / STFT / raw-waveform variants), a GE2E speaker
encoder, training/conversion pipelines, and neural vocoders — all designed
TPU-first around jit/lax.scan/pjit over jax.sharding meshes.

Layering (mirrors SURVEY.md §1 but as a proper package):

    dsp/      fused feature kernels (highpass filtfilt, STFT+mel, iSTFT, Griffin-Lim)
    data/     manifests (train.pkl/metadata.pkl compatible) + batch iterators
    models/   scan-LSTM/conv modules, Generator{Mel,STFT,Wav}, D_VECTOR
    losses/   recon MSE, content L1, SI-SDR family
    train/    jit train step, optax, EMA, orbax checkpointing, metrics
    vocoder/  WaveNet fast-generation scan, HiFi-GAN, Griffin-Lim/iSTFT
    convert/  pad/convert/results pipeline
    parallel/ mesh + sharding helpers (DP/TP over ICI)
    cli/      make_spect / make_metadata / train / convert / synthesize
"""

__version__ = "0.1.0"
