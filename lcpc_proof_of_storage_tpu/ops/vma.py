"""Varying-manual-axes plumbing for loop carries under shard_map.

Inside shard_map, arrays carry a set of mesh axes they vary over (vma).
A scan/fori_loop whose carry starts from constants but absorbs varying
data fails the carry type check; the fix is to pre-cast the initial carry
to the data's vma.  Outside shard_map this is a no-op.
"""

from __future__ import annotations

import jax


def match_vma(x, ref):
    """Return x cast to vary over the same manual mesh axes as ref."""
    if not hasattr(jax, "typeof"):
        return x
    try:
        vma = getattr(jax.typeof(ref), "vma", None)
    except Exception:
        return x
    if vma:
        x = jax.lax.pcast(x, tuple(vma), to="varying")
    return x
