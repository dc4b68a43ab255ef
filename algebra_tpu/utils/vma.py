"""Varying-manual-axes (vma) helper for shard_map compatibility.

shard_map's correctness checker tracks which mesh axes each value
*varies* over.  Scan carries initialized from replicated constants (an
identity point, Montgomery one) but updated with device-varying data
fail the carry-type check; the sanctioned fix is to pcast the init to
the data's vma set (https://docs.jax.dev/.../shard_map.html#scan-vma).
This helper does that generically so the sharded MSM/NTT paths run with
the checker ON (SURVEY.md §5: the analogous risk to the reference's
rayon data-race freedom is cross-shard reduction correctness — the one
static guard should not be waived).
"""

from __future__ import annotations

import jax


def match_vma(value, ref):
    """Pcast ``value``'s leaves to vary over the union of mesh axes that
    ``ref``'s leaves vary over.  A no-op outside shard_map tracing (vma
    sets are empty there) and on jax versions without the vma API."""
    try:
        vma: set = set()
        for leaf in jax.tree_util.tree_leaves(ref):
            vma |= set(jax.typeof(leaf).vma)
    except Exception:
        return value
    if not vma:
        return value

    def cast(a):
        missing = tuple(vma - set(jax.typeof(a).vma))
        if not missing:
            return a
        try:
            return jax.lax.pcast(a, missing, to="varying")
        except (AttributeError, TypeError):
            return jax.lax.pvary(a, missing)

    return jax.tree_util.tree_map(cast, value)
