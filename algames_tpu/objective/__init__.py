from .objective import (GameObjective, add_collision_cost, collision_stage_cost,
                        cost_gradient, cost_hessian, expand_vector,
                        game_objective, total_cost)

__all__ = [
    "GameObjective", "game_objective", "add_collision_cost", "expand_vector",
    "cost_gradient", "cost_hessian", "collision_stage_cost", "total_cost",
]
