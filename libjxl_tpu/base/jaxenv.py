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


# Result of the one-time guarded backend init: backend name, "" for
# unreachable/timed-out, None for "not probed yet".
_backend_probe = None


def default_backend_guarded(timeout_s: float = None):
    """Initialize JAX's default backend with a wall-clock bound.

    An accelerator PJRT plugin whose transport is unreachable blocks the
    first backend query forever inside an uninterruptible C call —
    hanging any CLI/library caller that merely ASKED whether a device
    exists. The init runs on a daemon thread; if it does not finish in
    `timeout_s` (env LIBJXL_TPU_BACKEND_TIMEOUT, default 60s) the caller
    gets None and must stay on the host path. The stuck thread is
    abandoned (daemon, never joined) and the failure is cached, so the
    process never touches jax's backend again. Mirrors the subprocess
    probe bench.py uses, without doubling init cost on healthy devices.
    """
    global _backend_probe
    if _backend_probe is not None:
        return _backend_probe or None
    ensure_cpu_pin()
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        _backend_probe = "cpu"
        return "cpu"
    if timeout_s is None:
        timeout_s = float(os.environ.get("LIBJXL_TPU_BACKEND_TIMEOUT",
                                         "60"))
    import threading

    box = {}

    def _init():
        try:
            import jax

            box["backend"] = jax.default_backend()
        except Exception:
            box["backend"] = ""

    t = threading.Thread(target=_init, daemon=True,
                         name="libjxl-tpu-backend-init")
    t.start()
    t.join(timeout_s)
    if t.is_alive() or not box.get("backend"):
        import logging

        logging.getLogger("libjxl_tpu").warning(
            "accelerator backend init %s after %.0fs; using the host "
            "path (set JAX_PLATFORMS=cpu to silence, or "
            "LIBJXL_TPU_BACKEND_TIMEOUT to wait longer)",
            "still blocked" if t.is_alive() else "failed", timeout_s)
        _backend_probe = ""
        return None
    _backend_probe = box["backend"]
    return _backend_probe
