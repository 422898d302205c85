"""--platform support for the CLI drivers.

The axon-style TPU plugins ignore the JAX_PLATFORMS environment variable,
so picking a backend from the shell does not work on TPU hosts; the
supported switch is ``jax.config.update("jax_platforms", ...)`` before
the backend initializes. Every sampling/analysis driver exposes
``--platform {cpu,tpu,...}`` and routes it here first thing in main()
(before any module that could run a JAX op is imported).
"""

from __future__ import annotations


def add_platform_arg(ap) -> None:
    ap.add_argument(
        "--platform", default=None, metavar="BACKEND",
        help="pin the JAX backend for this run (e.g. 'cpu' for a smoke "
             "run on a TPU host); default: the platform JAX selects")


def force_platform(platform: str | None) -> None:
    """Pin the JAX backend before first use; no-op when platform is None."""
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
