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


def apply_platform(args) -> None:
    if getattr(args, "platform", None):
        import jax

        jax.config.update("jax_platforms", args.platform)
    from autovc_tpu.compile_cache import enable

    enable()
