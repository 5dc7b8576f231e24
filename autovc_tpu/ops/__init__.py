"""Pallas TPU kernels for the hot ops.

- pallas_lstm: fused LSTM sequence kernel — weights pinned in VMEM across
  the whole time loop (the cuDNN-class LSTM path; SURVEY hard-part #3)
- pallas_mel: fused |STFT| -> mel matmul -> dB-normalize kernel

Both run in interpret mode on CPU for testing; on TPU they compile to Mosaic.
"""

from autovc_tpu.ops.pallas_lstm import lstm_sequence
from autovc_tpu.ops.pallas_mel import mel_normalize

__all__ = ["lstm_sequence", "mel_normalize"]
