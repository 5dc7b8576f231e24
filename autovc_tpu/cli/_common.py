"""Shared CLI plumbing."""

from __future__ import annotations

import argparse


def add_platform_arg(ap: argparse.ArgumentParser) -> None:
    ap.add_argument(
        "--platform",
        default=None,
        help="JAX platform override (e.g. 'cpu', 'tpu'). Needed because some "
        "environments pre-latch JAX_PLATFORMS before the process env applies.",
    )
    ap.add_argument(
        "--precision",
        default=None,
        choices=["default", "high", "highest"],
        help="matmul precision. TPU f32 matmuls default to bf16 passes "
        "(fast; ~1e-2 drift through deep LSTM stacks vs CPU); 'highest' "
        "gives f32-exact MXU passes (measured 2.7e-4 TPU-vs-CPU agreement "
        "on full conversions).",
    )


def apply_platform(args) -> None:
    import jax

    if getattr(args, "platform", None):
        jax.config.update("jax_platforms", args.platform)
    if getattr(args, "precision", None):
        jax.config.update("jax_default_matmul_precision", args.precision)
    from autovc_tpu.compile_cache import enable

    enable()
