"""CLI entry points (reference L5: main.py, conversion.py, vocoder.py).

    python -m autovc_tpu.cli.make_spect     feature extraction
    python -m autovc_tpu.cli.make_metadata  embeddings + manifests
    python -m autovc_tpu.cli.train          training
    python -m autovc_tpu.cli.convert        batch voice conversion
    python -m autovc_tpu.cli.synthesize     vocoder synthesis
"""
