"""CLI drivers mirroring the reference's examples/demo_*.cpp binaries."""

import os


def apply_platform_env() -> None:
    """Honor VAQ_TPU_PLATFORM=cpu|tpu|axon.

    This session's sitecustomize pins the TPU platform via jax.config after
    env inspection, so the JAX_PLATFORMS env var alone cannot force CPU; an
    explicit config update after import can.
    """
    plat = os.environ.get("VAQ_TPU_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
