"""Binary checkpoint / resume.

The reference has no binary checkpoint format — resume is compositional
(simulate!(init_step=...), SURVEY.md section 5). Here a checkpoint is a
single npz capturing the full dynamic state: coordinates, velocities, box,
step counter and the PRNG key — with JAX's counter-based RNG the restart is
bit-exact.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def save_checkpoint(path, sys, step_n=0, key=None, extra=None):
    data = {
        "coords": np.asarray(sys.coords),
        "velocities": np.asarray(sys.velocities),
        "step_n": np.asarray(step_n),
    }
    from ..boundary import Orthorhombic
    if isinstance(sys.boundary, Orthorhombic):
        data["box_sides"] = np.asarray(sys.boundary.side_lengths)
    else:
        data["box_basis"] = np.asarray(sys.boundary.basis)
    if key is not None:
        try:
            data["rng_key"] = np.asarray(jax.random.key_data(key))
            data["rng_key_typed"] = np.asarray(1)
        except TypeError:
            data["rng_key"] = np.asarray(key)
            data["rng_key_typed"] = np.asarray(0)
    if extra:
        for k, v in extra.items():
            data["extra_" + k] = np.asarray(v)
    np.savez(path, **data)


def load_checkpoint(path, sys):
    """Returns (sys, step_n, key_or_None, extra dict)."""
    from ..boundary import Orthorhombic, Triclinic
    z = np.load(path)
    dtype = sys.coords.dtype
    sys = sys.update(coords=jnp.asarray(z["coords"], dtype),
                     velocities=jnp.asarray(z["velocities"], dtype))
    if "box_sides" in z:
        sys = sys.update(boundary=Orthorhombic(jnp.asarray(z["box_sides"], dtype)))
    elif "box_basis" in z:
        sys = sys.update(boundary=Triclinic(jnp.asarray(z["box_basis"], dtype)))
    key = None
    if "rng_key" in z:
        raw = jnp.asarray(z["rng_key"])
        if int(z.get("rng_key_typed", 0)):
            key = jax.random.wrap_key_data(raw)
        else:
            key = raw
    extra = {k[6:]: z[k] for k in z.files if k.startswith("extra_")}
    return sys, int(z["step_n"]), key, extra
