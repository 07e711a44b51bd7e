from . import residual
from .linear_solver import newton_step, solve_dense, solve_tridiagonal
from .options import IBROptions, Options, Penalty, Regularizer
from .problem import GameProblem, game_problem
from .solver import SolveResult, line_search, newton_solve, newton_solve_jit

__all__ = [
    "Options", "IBROptions", "GameProblem", "game_problem",
    "newton_solve", "newton_solve_jit", "SolveResult", "line_search",
    "newton_step", "solve_dense", "solve_tridiagonal", "residual",
]
