"""Unified typed configuration tree.

Replaces the reference's three uncoordinated config mechanisms (argparse in
main.py:44-72, the hparams.py dot-dict, and hardcoded module constants in
make_spect.py:21-27 / conversion.py:22-31) with one dataclass tree.

Defaults reproduce the reference's training contract exactly
(main.py:47-71, make_spect.py:21-27, hparams.py:44-165).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class AudioConfig:
    """Audio/feature contract (reference make_spect.py:21-27,51,82-86)."""

    sample_rate: int = 16_000
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mels: int = 80
    mel_fmin: float = 90.0
    mel_fmax: float = 7600.0
    # Butterworth highpass used to remove drifting noise (make_spect.py:30-34)
    highpass_cutoff_hz: float = 30.0
    highpass_order: int = 5
    # dB normalization: clip((20*log10(max(1e-5, .)) - ref + 100)/100, 0, 1)
    min_level_db: float = -100.0
    ref_level_db: float = 16.0
    # dither amplitude applied after the highpass (make_spect.py:76)
    dither_scale: float = 0.96
    dither_amp: float = 1e-6
    # RobustScaler quantile range for the raw-waveform variant (make_spect.py:88)
    robust_quantile_range: tuple[float, float] = (5.0, 95.0)
    # the legacy 512-pt pipeline ("old code/make_spect_old.py":19 pySTFT
    # fft_length=int(1024*0.5)) -> 257-bin magnitude features, pinned against
    # the bundled test_data/STFT goldens
    legacy_n_fft: int = 512

    @property
    def n_stft_bins(self) -> int:
        return self.n_fft // 2 + 1  # 513

    @property
    def n_legacy_bins(self) -> int:
        return self.legacy_n_fft // 2 + 1  # 257


@dataclass(frozen=True)
class ModelConfig:
    """AutoVC generator family hyperparameters (reference main.py:49-53,65).

    ``model_type`` selects the variant exactly as the reference's flag does:
      - 'spmel': 80-bin mel autoencoder             (model_vc_mel.py)
      - 'stft' : 513-bin magnitude-STFT autoencoder (model_vc_stft.py)
      - 'wav'  : raw-waveform ConvTasNet-wrapped    (model_vc_wav.py)
    The stft/wav variants are clean parameterizations here (n_bins / front-end),
    not module surgery, which also fixes the reference's latent
    GeneratorSTFT.forward AttributeError (model_vc_stft.py:44-46) by construction.
    """

    model_type: str = "spmel"  # 'spmel' | 'stft' | 'wav'
    dim_neck: int = 32
    dim_emb: int = 256
    dim_pre: int = 512
    freq: int = 32  # bottleneck time-downsampling factor
    # ConvTasNet front/back-end depth for the wav variant (model_vc_wav.py:21,44)
    convtas_depth: int = 1
    convtas_channels: int = 512
    convtas_kernel: int = 1024
    convtas_stride: int = 256
    # encoder/decoder internals (model_vc_mel.py:50-61,90-106)
    enc_channels: int = 512
    dec_lstm_dim: int = 1024
    postnet_channels: int = 512
    # compute dtype for matmul-heavy paths; params stay float32
    compute_dtype: str = "float32"
    # Pallas fused LSTM kernels (forward + custom-VJP backward). On the
    # tunneled-AOT TPU environment they compile ~500x faster than the XLA
    # scan at equal runtime — big win for conversion/training compiles.
    use_pallas_lstm: bool = False

    @property
    def n_bins(self) -> int:
        """Feature dimensionality entering/leaving the AutoVC core."""
        if self.model_type == "spmel":
            return 80
        if self.model_type == "stft":
            return 513
        if self.model_type == "wav":
            return self.convtas_channels
        raise ValueError(f"unknown model_type: {self.model_type!r}")


@dataclass(frozen=True)
class SpeakerEncoderConfig:
    """GE2E d-vector encoder (reference model_bl.py:5-11, make_metadata.py:41)."""

    dim_input: int = 80
    dim_cell: int = 768
    dim_emb: int = 256
    num_layers: int = 3
    num_uttrs: int = 10  # utterances averaged per speaker (make_metadata.py:21)
    len_crop: int = 128  # crop length fed to the encoder (make_metadata.py:23)


@dataclass(frozen=True)
class TrainConfig:
    """Training contract (reference main.py:47-71, solver_encoder.py:118-145)."""

    lambda_cd: float = 1.0
    lambda_sisnr: float = 1.0
    batch_size: int = 2
    num_iters: int = 10_000_000
    len_crop: int = 128  # 128 frames for spmel/stft; 33536 samples for wav
    lr: float = 1e-4
    lr_scheduler: str | None = None  # None | 'Cosine' | 'CosineDecay' | 'Plateau'
    cosine_t_max: int = 10_000
    # one-shot CosineDecay: anneal over num_iters down to this fraction of lr
    cosine_eta_min_ratio: float = 0.01
    plateau_factor: float = 0.1
    plateau_patience: int = 10
    # speaker-consistency auxiliary (TPU-first addition, not in the
    # reference): within-batch cross-conversions are re-embedded by a FROZEN
    # GE2E encoder (spk_ckpt) and pulled toward the target embedding by a
    # cosine loss. 0.0 = exactly the reference objective. spmel/stft only.
    lambda_spk: float = 0.0
    spk_ckpt: str | None = None
    # lambda_spk protocol: 'windowed' (v2) embeds the converted crop with the
    # EVALUATION's windowed protocol (eval.SpeakerEmbedder: 128-frame windows,
    # stride 64, mean-then-normalize) and applies a hinge on the eval's own
    # criterion — cos(e, target centroid) - cos(e, source centroid) >=
    # spk_margin — against eval-protocol speaker centroids. 'crop' (v1) is the
    # round-3 single-window cosine pull toward the conditioning embedding,
    # kept for the documented study (docs/VALIDATION_r3.md §2b: it Goodharts).
    spk_protocol: str = "windowed"  # 'windowed' | 'crop'
    spk_margin: float = 1.5  # hinge target (windowed); <=~1.1 is inert —
    # crop margins already sit there (the 100% result used 1.5)
    ema_decay: float = 0.9999  # applied as a REAL per-step EMA (ref bug fixed)
    log_step: int = 100
    checkpoint_step: int = 100
    log_spectrograms: bool = False  # dump original/reconstructed figures
    # param/grad histogram interval (reference wandb.watch log_freq=1000,
    # solver_encoder.py:203); 0 disables. See train/watch.py.
    watch_step: int = 0
    seed: int = 0
    # parallelism: number of data-parallel shards (mesh axis 'data') and
    # tensor-parallel shards (mesh axis 'model'); 1 disables the axis
    data_parallel: int = 1
    model_parallel: int = 1


@dataclass(frozen=True)
class WaveNetConfig:
    """WaveNet vocoder architecture (reference hparams.py:44-165).

    Matches the r9y9 wavenet_vocoder build driven by synthesis.py:19-40:
    scalar input, mixture-of-logistics output, mel local conditioning with
    transposed-conv upsampling x256.
    """

    out_channels: int = 30  # 10 logistic mixtures * (pi, mu, log_s)
    layers: int = 24
    stacks: int = 4
    residual_channels: int = 512
    gate_channels: int = 512  # split into tanh/sigmoid halves internally
    skip_channels: int = 256
    kernel_size: int = 3
    cin_channels: int = 80
    upsample_scales: tuple[int, ...] = (4, 4, 4, 4)
    freq_axis_kernel_size: int = 3
    log_scale_min: float = -32.23619130191664
    # vocoder-side audio params (hparams.py:63-74; fmin=125 intentionally
    # differs from the AutoVC feature fmin=90 — preserved quirk, SURVEY §7)
    sample_rate: int = 16_000
    hop_size: int = 256
    num_mels: int = 80
    fmin: float = 125.0
    fmax: float = 7600.0

    @property
    def layers_per_stack(self) -> int:
        return self.layers // self.stacks

    def dilations(self) -> tuple[int, ...]:
        return tuple(2 ** (i % self.layers_per_stack) for i in range(self.layers))


@dataclass(frozen=True)
class HiFiGANConfig:
    """HiFi-GAN V1 generator — the parallel (non-autoregressive) vocoder
    alternative mentioned at reference README.md:43. Upsample product must
    equal hop_length (8*8*2*2 = 256)."""

    in_channels: int = 80
    upsample_initial_channel: int = 512
    upsample_rates: tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: tuple[int, ...] = (16, 16, 4, 4)
    resblock_kernel_sizes: tuple[int, ...] = (3, 7, 11)
    resblock_dilations: tuple[tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    leaky_relu_slope: float = 0.1


@dataclass(frozen=True)
class Config:
    """Top-level config tree."""

    audio: AudioConfig = field(default_factory=AudioConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    speaker: SpeakerEncoderConfig = field(default_factory=SpeakerEncoderConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    wavenet: WaveNetConfig = field(default_factory=WaveNetConfig)
    hifigan: HiFiGANConfig = field(default_factory=HiFiGANConfig)
    # directories (reference main.py:56: --main_dir)
    main_dir: str = "."
    run_name: str = "run"
    # wandb run id for resume (reference main.py:67-68 --run_id,
    # solver_encoder.py:96-98: wandb.init(resume='must', id=run_id))
    run_id: str | None = None

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)


def wav_len_crop(audio: AudioConfig, frames: int = 128) -> int:
    """Waveform crop aligning the ConvTasNet latent to `frames` frames:
    (frames-1)*hop + win = 33536 for the defaults (reference main.py:59)."""
    return (frames - 1) * audio.hop_length + audio.win_length
