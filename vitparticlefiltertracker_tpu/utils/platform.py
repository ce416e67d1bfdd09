"""Backend-selection helper shared by the CLI, tools, and examples."""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    """Make `JAX_PLATFORMS=cpu python ...` actually run on CPU.

    Some TPU plugins (including this image's tunneled-TPU plugin) prepend
    themselves to jax_platforms at import, silently overriding the standard
    env var — re-apply the user's explicit choice before the first jax op.
    No-op when the var is unset or jax is configured already."""
    want = os.environ.get("JAX_PLATFORMS", "").strip()
    if want:
        import jax

        jax.config.update("jax_platforms", want)
