from . import (  # noqa: F401
    asof,
    calendar_align,
    dedup,
    pit,
    rangejoin,
    reshape,
    setops,
    similarity,
    stats,
    topk,
    windows,
)
from ._cache import release_caches  # noqa: F401
