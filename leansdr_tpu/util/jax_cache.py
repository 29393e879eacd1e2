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
    # The ISA flag line alone is NOT discriminating enough: two CPUs
    # with identical flags but different models get different LLVM
    # tuning features (+prefer-no-gather/-scatter etc. come from the
    # model, not from cpuid flags), and XLA:CPU AOT results embed those
    # (observed r5: a cache written on a sibling machine loaded here
    # with a feature-mismatch warning and produced wrong numerics).
    # Key by vendor/family/model/stepping/model-name + flags.
    keys = ("vendor_id", "cpu family", "model", "model name",
            "stepping", "flags")
    try:
        with open("/proc/cpuinfo") as f:
            lines = []
            for line in f:
                k = line.split(":")[0].strip()
                if k in keys:
                    lines.append(line.strip())
                if k == "flags":
                    break          # first core is enough
            cpu = "\n".join(lines)
    except OSError:
        import platform
        cpu = platform.processor()
    return hashlib.sha1(cpu.encode()).hexdigest()[:8]


def setup_cache(repo_root: Path | str | None = None) -> None:
    """Enable the machine-keyed persistent cache.  LEANSDR_NO_JAX_CACHE=1
    skips it entirely (diagnostic: the cache load/write path is the one
    place zstandard + AOT deserialization run inside test processes)."""
    import os
    if os.environ.get("LEANSDR_NO_JAX_CACHE"):
        return
    import jax
    root = Path(repo_root) if repo_root else \
        Path(__file__).resolve().parent.parent.parent
    jax.config.update("jax_compilation_cache_dir",
                      str(root / ".jax_cache" / machine_tag()))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
