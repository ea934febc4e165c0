from .spatial import euclidean_dist, heading_wrap_deg, velocity_components
from .text import count_pii, redact_pii

__all__ = [
    "euclidean_dist",
    "heading_wrap_deg",
    "velocity_components",
    "count_pii",
    "redact_pii",
]
