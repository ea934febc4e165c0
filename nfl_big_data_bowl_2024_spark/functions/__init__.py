from .spatial import euclidean_dist, heading_wrap_deg, velocity_components

__all__ = ["euclidean_dist", "heading_wrap_deg", "velocity_components"]
