"""Platform detection for backend selection.

The single source of truth for "are we on real TPU hardware": the
remote-tunneled backend in this environment registers itself under the
platform name "axon" (experimental alias of a real TPU chip), so any
check of `jax.default_backend() == "tpu"` alone silently misroutes the
production paths — the fused-kernel auto path would fall back to XLA and
`backend="pallas"` would run the Mosaic kernel in interpret mode
on-device (advisor finding, round 1). Everything that branches on
hardware (models/gat._resolve_backend, the fused-path interpret flag,
benchmarks) must go through `is_tpu_backend()`.
"""

from __future__ import annotations

import jax

_TPU_PLATFORM_NAMES = ("tpu", "axon")


def is_tpu_backend() -> bool:
    """True when the default JAX backend is real TPU hardware (including
    the tunneled "axon" registration of a remote chip)."""
    return jax.default_backend() in _TPU_PLATFORM_NAMES
