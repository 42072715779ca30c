"""AOT-compiled inference engine.

Parity piece for the reference's DinoTrtInterface / TrtModel
(/root/reference/wild_visual_navigation/feature_extractor/dino_trt_interface.py:18-181),
which deserializes a TensorRT engine and executes it with raw device
pointers. The TPU-native equivalent is XLA ahead-of-time compilation:
`jax.jit(...).lower(...).compile()` produces an executable whose
serialized form can be cached on disk and reloaded without re-tracing —
the same deploy-time win (no compile at robot boot) the reference gets
from TensorRT.

Serialization uses jax's compilation cache (persistent across
processes for identical program+platform); `AOTEngine.save/load`
additionally pickles the (params, input spec) so a cold process can
rebuild and hit the cache instantly.
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def enable_persistent_cache(path: str = "/tmp/wvn_xla_cache"):
    """Turn on XLA's persistent compilation cache (deserialized-engine
    equivalent of the .trt file)."""
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


class AOTEngine:
    """An ahead-of-time compiled (fn, params) pair with fixed input
    shapes — call it like the TrtModel __call__ (dino_trt_interface.py:51)."""

    def __init__(self, fn: Callable, params, example_input: jnp.ndarray, donate_input: bool = False):
        self._fn = fn
        self.params = params
        self.input_shape = tuple(example_input.shape)
        self.input_dtype = example_input.dtype
        t0 = time.time()
        lowered = jax.jit(fn).lower(params, example_input)
        self._compiled = lowered.compile()
        self.compile_seconds = time.time() - t0

    def __call__(self, x: jnp.ndarray):
        if tuple(x.shape) != self.input_shape:
            raise ValueError(f"AOTEngine expects {self.input_shape}, got {tuple(x.shape)}")
        return self._compiled(self.params, x)

    @property
    def flops(self) -> Optional[float]:
        try:
            return self._compiled.cost_analysis()["flops"]
        except Exception:
            return None

    def memory_analysis(self):
        try:
            return self._compiled.memory_analysis()
        except Exception:
            return None


def save_engine_spec(path: str, params, input_shape: Tuple[int, ...], input_dtype: str, meta: dict):
    """Persist params + input spec; the executable itself is rebuilt via
    the persistent compilation cache (instant when warm)."""
    from flax import serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump({
            "params": serialization.to_bytes(params),
            "input_shape": input_shape,
            "input_dtype": input_dtype,
            "meta": meta,
        }, f)
    return path


def load_engine_spec(path: str, params_template):
    from flax import serialization

    with open(path, "rb") as f:
        payload = pickle.load(f)
    params = serialization.from_bytes(params_template, payload["params"])
    return params, tuple(payload["input_shape"]), payload["input_dtype"], payload["meta"]
