"""Device selection (the reference's torch_utils.select_device role).

This machine's sitecustomize imports jax's config machinery at interpreter
startup with JAX_PLATFORMS=axon baked in, so env vars set later don't
switch backends — ``jax.config.update`` before first backend use does.
"""

from __future__ import annotations


def select_device(name: str = "") -> str:
    """Pick the JAX platform before first use. '' keeps the environment's
    default (the TPU when available). Returns the platform that will be
    used."""
    import jax

    if name:
        jax.config.update("jax_platforms", name)
    return jax.default_backend()


def device_info() -> str:
    import jax

    devs = jax.devices()
    return (f"backend={jax.default_backend()} n={len(devs)} "
            f"[{', '.join(d.device_kind for d in devs[:4])}]")
