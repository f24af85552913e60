"""x265amod_tpu: TPU-native HEVC encoder (JAX/XLA/Pallas + C++ host).

Brand-new implementation with the capabilities of the reference
DJATOM/x265-aMod encoder (see SURVEY.md), designed TPU-first.
"""

import os

import jax

# Optional persistent compilation cache (opt-in: set X265AMOD_TPU_CACHE
# to a directory).  Encoder programs are large and recompiling per
# process costs minutes; however some remote-TPU backends have been
# observed to stall when loading cached executables, so default is off.
_cache_dir = os.environ.get("X265AMOD_TPU_CACHE")
if _cache_dir:
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass

__version__ = "0.1.0"
