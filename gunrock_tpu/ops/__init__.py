from .advance import ExpandedEdges, expand, expand_inverse, pull_reduce  # noqa: F401
from .filter import cull_filter, bypass_filter  # noqa: F401
from .segment import (  # noqa: F401
    scatter_min, scatter_max, scatter_add, scatter_set,
    dedup_winners, compact, frontier_from_mask, mask_from_frontier,
)
