"""Pin JAX to the CPU backend when JAX_PLATFORMS=cpu is set.

Some accelerator PJRT plugins register an initialization hook that runs
regardless of the JAX_PLATFORMS environment variable; if the accelerator
is unreachable, the first backend query then blocks forever — hanging
CLI tools that never asked for a device. `jax.config.update` takes
precedence over the hook, so honoring the env var explicitly restores
the documented opt-out. Call ensure_cpu_pin() right after importing
jax at module scope (idempotent, no-op unless JAX_PLATFORMS=cpu).
"""

from __future__ import annotations

import os

_done = False


def ensure_cpu_pin() -> None:
    global _done
    if _done:
        return
    _done = True
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        try:
            import jax

            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
