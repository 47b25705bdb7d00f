"""Deferred JAX initialization.

Importing jax costs ~2.5 s of process startup; stretch/decimate/host-numpy
CLI runs never need it.  Every module that uses jax calls ``ensure_jax()``
(at its own import or first use), which imports jax on demand and enables
the 64-bit data path exactly once — float64 offsets/queries and the f64
engine path need x64, and all kernels are explicitly dtyped so the f32
fast paths are unaffected (the PATH_WIDTH analog, see package docstring).
"""

from __future__ import annotations

_configured = False


def ensure_jax():
    """Import jax (on first call) with the package's global config applied."""
    global _configured
    import jax
    if not _configured:
        jax.config.update("jax_enable_x64", True)
        _configured = True
    return jax
