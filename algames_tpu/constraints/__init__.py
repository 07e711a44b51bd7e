from . import kernels
from .sets import (ConBlock, CylinderWall, GameConstraints, Wall,
                               Wall3D, add_circle_constraint,
                               add_collision_avoidance, add_control_bound,
                               add_spherical_collision_avoidance,
                               add_state_bound, add_velocity_bound,
                               add_wall_constraint, al_expansion,
                               block_jacobian, block_values, control_violation,
                               dynamics_violation_vector,
                               dual_update, game_constraints, penalty_update,
                               reset_constraint_duals, reset_constraints,
                               reset_penalties, set_constraint_params,
                               state_violation, update_active_set)

__all__ = [
    "kernels", "ConBlock", "GameConstraints", "game_constraints",
    "Wall", "Wall3D", "CylinderWall",
    "add_collision_avoidance", "add_spherical_collision_avoidance",
    "add_state_bound", "add_control_bound", "add_circle_constraint",
    "add_wall_constraint", "add_velocity_bound",
    "al_expansion", "block_values", "block_jacobian",
    "dual_update", "penalty_update", "update_active_set", "reset_constraints", "reset_penalties", "reset_constraint_duals",
    "set_constraint_params", "state_violation", "control_violation",
    "dynamics_violation_vector",
]
