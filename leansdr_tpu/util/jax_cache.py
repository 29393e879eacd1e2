"""Persistent-compilation-cache setup, keyed by host CPU.

XLA:CPU AOT results embed the compile machine's feature set; loading a
cache written on a different host is only a WARNING ("could lead to
execution errors such as SIGILL") and was observed to produce wrong
numerics when build rounds run on heterogeneous machines.  Keying the
cache directory by the host's CPU flags makes stale entries unreachable
instead of silently loaded.
"""

import hashlib
from pathlib import Path


def machine_tag() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            cpu = next((l for l in f if l.startswith("flags")), "")
    except OSError:
        import platform
        cpu = platform.processor()
    return hashlib.sha1(cpu.encode()).hexdigest()[:8]


def setup_cache(repo_root: Path | str | None = None) -> None:
    import jax
    root = Path(repo_root) if repo_root else \
        Path(__file__).resolve().parent.parent.parent
    jax.config.update("jax_compilation_cache_dir",
                      str(root / ".jax_cache" / machine_tag()))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
