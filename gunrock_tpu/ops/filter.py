"""Filter operator: cull duplicates / invalid items, compact the frontier.

Replaces the reference's filter kernel zoo (``oprtr/filter/kernel.cuh:440``
LaunchKernel dispatching CULL / SIMPLIFIED / COMPACTED_CULL / BY_PASS,
``oprtr/filter/kernel_policy.cuh:27-32``) with two deterministic dataflows:

  * CULL   -> claim-scatter dedup + predicate + mask-scan compaction
  * BY_PASS-> predicate only, no compaction (full-frontier primitives, PR)

The reference's bitmask/history/warp-hash heuristic culls
(``oprtr/cull_filter/cta.cuh``) are *best-effort* (may leave duplicates);
our claim dedup is exact, so downstream never sees duplicate vertices —
a strictly stronger guarantee with one O(V) scatter.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax

from .segment import compact, dedup_winners

__all__ = ["cull_filter", "bypass_filter"]


def cull_filter(
    items: jax.Array,
    mask: jax.Array,
    *,
    size: int,
    cap: int,
    cond: Optional[Callable[[jax.Array], jax.Array]] = None,
    dedup: bool = True,
    fill: int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Dedup + predicate + compact candidate vertices into a new frontier.

    ``items``: candidate vertex ids (one per advance output lane);
    ``mask``: active lanes; ``size``: vertex-space size for the claim table;
    ``cond``: vectorized CondFilter (``oprtr/filter``'s functor hook) taking
    the item vector and returning a keep mask. Returns
    ``(frontier, length, keep_mask)`` — ``keep_mask`` marks the surviving
    lanes in advance-output order so callers can commit ApplyFilter-style
    side updates for exactly the surviving lanes.
    """
    keep = mask
    if cond is not None:
        keep = keep & cond(items)
    if dedup:
        keep = dedup_winners(items, keep, size)
    frontier, length = compact(items, keep, cap, fill=fill)
    return frontier, length, keep


def bypass_filter(
    items: jax.Array,
    mask: jax.Array,
    *,
    cond: Optional[Callable[[jax.Array], jax.Array]] = None,
) -> jax.Array:
    """BY_PASS filter (``oprtr/bypass_filter/``): apply the predicate,
    keep the frontier uncompacted; returns the updated mask."""
    if cond is None:
        return mask
    return mask & cond(items)
