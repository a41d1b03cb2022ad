from .engine import GoldenEngine, Hooks, markermiss, upflagit

__all__ = ["GoldenEngine", "Hooks", "markermiss", "upflagit"]
