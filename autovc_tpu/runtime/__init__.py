"""Native runtime bindings (ctypes over libautovc_runtime.so).

Builds lazily via `make` on first use if the shared object is missing;
falls back cleanly (native_available() == False) when no toolchain exists.
"""

from autovc_tpu.runtime.bindings import (
    FeatureStore,
    native_available,
    read_wavs,
)

__all__ = ["FeatureStore", "native_available", "read_wavs"]
