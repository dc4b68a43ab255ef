"""Runtime configuration knobs (the reference's cargo features analogue:
`asm`/`parallel` become backend dispatch decisions made at trace time)."""

from __future__ import annotations

# None = auto: use Pallas kernels when the default backend is a TPU.
use_pallas: bool | None = None

# Minimum flattened batch size before the Pallas path is worth its
# padding/launch overhead; below this the fused-XLA path wins.
pallas_min_batch: int = 4096


def pallas_enabled() -> bool:
    if use_pallas is not None:
        return bool(use_pallas)
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
