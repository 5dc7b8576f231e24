"""Model family (reference L3): AutoVC generators, speaker encoder, layers."""

from autovc_tpu.models.layers import (
    BatchNorm,
    ConvNorm,
    ConvTranspose1d,
    LSTM,
    LinearNorm,
    PReLU,
)
from autovc_tpu.models.autovc import Decoder, Encoder, Generator, Postnet
from autovc_tpu.models.convtas import ConvTasDecoder, ConvTasEncoder, GeneratorWav
from autovc_tpu.models.dvector import DVector


def build_generator(model_cfg):
    """Variant selection by model_type (reference solver_encoder.py:118-126).

    compute_dtype='bfloat16' runs matmul/conv compute in bf16 (params stay
    float32) — the MXU-native precision; losses upcast to float32.
    """
    import jax.numpy as jnp

    dtype = {"float32": None, "bfloat16": jnp.bfloat16}[model_cfg.compute_dtype]
    if model_cfg.model_type in ("spmel", "stft"):
        return Generator(
            dim_neck=model_cfg.dim_neck,
            dim_emb=model_cfg.dim_emb,
            dim_pre=model_cfg.dim_pre,
            freq=model_cfg.freq,
            n_bins=model_cfg.n_bins,
            dtype=dtype,
            use_pallas=model_cfg.use_pallas_lstm,
        )
    if model_cfg.model_type == "wav":
        return GeneratorWav(
            dim_neck=model_cfg.dim_neck,
            dim_emb=model_cfg.dim_emb,
            dim_pre=model_cfg.dim_pre,
            freq=model_cfg.freq,
            depth=model_cfg.convtas_depth,
            channels=model_cfg.convtas_channels,
            dtype=dtype,
            use_pallas=model_cfg.use_pallas_lstm,
        )
    raise ValueError(f"unknown model_type {model_cfg.model_type!r}")


__all__ = [
    "BatchNorm",
    "ConvNorm",
    "ConvTranspose1d",
    "LSTM",
    "LinearNorm",
    "PReLU",
    "Encoder",
    "Decoder",
    "Postnet",
    "Generator",
    "GeneratorWav",
    "ConvTasEncoder",
    "ConvTasDecoder",
    "DVector",
    "build_generator",
]
