from .fb_pallas import fb_sweeps_pallas

__all__ = ["fb_sweeps_pallas"]
