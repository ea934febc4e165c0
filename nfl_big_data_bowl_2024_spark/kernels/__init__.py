from .lqr import solve_optimal_path

__all__ = ["solve_optimal_path"]
