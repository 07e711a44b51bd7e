from .active_set import (NullSpace, active, active_masks, extended_jacobian,
                         extended_residual, get_collision_block, hcol,
                         nullspace_basis, ordered_pairs, sizes,
                         unordered_pairs, update_nullspace, vrow)

__all__ = [
    "NullSpace", "active", "active_masks", "extended_jacobian",
    "extended_residual", "get_collision_block", "hcol", "nullspace_basis",
    "ordered_pairs", "sizes", "unordered_pairs", "update_nullspace", "vrow",
]
