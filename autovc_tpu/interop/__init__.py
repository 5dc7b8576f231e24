from autovc_tpu.interop.torch_import import (
    convert_lstm,
    convert_conv,
    convert_linear,
    convert_bn,
    generator_params_from_torch,
    generator_wav_params_from_torch,
    dvector_params_from_torch,
)

__all__ = [
    "convert_lstm",
    "convert_conv",
    "convert_linear",
    "convert_bn",
    "generator_params_from_torch",
    "generator_wav_params_from_torch",
    "dvector_params_from_torch",
]
