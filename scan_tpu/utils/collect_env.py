"""Environment report logged at startup.

Parity target: reference ``fcos_core/utils/collect_env.py:1-14``
(``collect_env_info`` = torch env report + Pillow version, logged by every
tool before training). The TPU-native report covers the JAX stack instead:
versions, backend/devices, and the relevant library versions.
"""

import platform
import sys


def _ver(mod_name: str) -> str:
    try:
        mod = __import__(mod_name)
        return getattr(mod, "__version__", "unknown")
    except Exception:
        return "not installed"


def collect_env_info() -> str:
    import jax

    lines = [
        f"sys.platform: {sys.platform}",
        f"Python: {sys.version.replace(chr(10), ' ')}",
        f"machine: {platform.machine()}",
        f"JAX: {jax.__version__}",
    ]
    try:
        lines.append(f"jax backend: {jax.default_backend()}")
        lines.append(
            "devices: "
            + ", ".join(str(d) for d in jax.devices())
        )
    except Exception as e:  # backend init can fail in odd environments
        lines.append(f"jax backend: unavailable ({e})")
    for mod in ("jaxlib", "flax", "optax", "orbax.checkpoint", "numpy",
                "PIL"):
        top = mod.split(".")[0]
        lines.append(f"{mod}: {_ver(top)}")
    return "\n".join(lines)
