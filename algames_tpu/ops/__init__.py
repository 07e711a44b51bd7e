from .thomas_pallas import solve_thomas_pallas

__all__ = ["solve_thomas_pallas"]
