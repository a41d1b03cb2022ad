from .simulate import simulate_f2

__all__ = ["simulate_f2"]
