"""Heterogeneous-dimension double-integrator game (synthetic).

The reference's indexing handles per-player control/state dims throughout
(``src/core/newton_core.jl:40-89``, ``src/struct/problem_size.jl:5-17``) even
though all four shipped models are homogeneous.  This model exercises that
structural capability end-to-end: player ``i`` is a d-dim double integrator
actuating only its FIRST ``mi[i]`` acceleration components (``mi[i] <= d``;
the rest coast).  Layout is player-blocked (pz contiguous, controls packed
``[u_0 (mi_0) | u_1 (mi_1) | ...]``) — the spec's index tuples carry the
raggedness; no interleaving is possible with unequal mi.

Every linear-solver method handles mixed mi: ``tridiag``/``cr``/``dense``
natively, and the player-stacked ``schur``/``pallas`` fast paths by
pad-and-mask (controls padded to max(mi) with exactly-decoupled identity
rows; see ``problem/linear_solver.py`` / ``ops/thomas_pallas.py``).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from .base import GameModel


@dataclasses.dataclass(frozen=True)
class HeteroDoubleIntegratorGame(GameModel):
    d: int = 2

    def dynamics(self, x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        d = self.d
        parts = []
        for i in range(self.p):
            zi = x[2 * d * i:2 * d * (i + 1)]
            ui = u[jnp.asarray(self.pu[i])] if self.mi[i] else u[0:0]
            acc = jnp.concatenate(
                [ui, jnp.zeros((d - self.mi[i],), x.dtype)])
            parts.append(jnp.concatenate([zi[d:], acc]))
        return jnp.concatenate(parts)

    @property
    def dim(self) -> int:
        return self.d

    def velocity_index(self, i: int) -> int:
        raise NotImplementedError(
            "Velocity index is not defined for double-integrator models "
            "(reference src/constraints/velocity_constraint.jl:39-42)")


def hetero_double_integrator_game(mi: Tuple[int, ...] = (2, 1),
                                  d: int = 2) -> HeteroDoubleIntegratorGame:
    """p = len(mi) players; player i actuates ``mi[i] <= d`` dims."""
    p = len(mi)
    assert all(1 <= k <= d for k in mi)
    n = 2 * d * p
    m = sum(mi)
    offs = [sum(mi[:i]) for i in range(p)]
    return HeteroDoubleIntegratorGame(
        n=n, m=m, p=p,
        ni=(2 * d,) * p, mi=tuple(mi),
        pu=tuple(tuple(range(offs[i], offs[i] + mi[i])) for i in range(p)),
        px=tuple(tuple(range(2 * d * i, 2 * d * i + 2)) for i in range(p)),
        pz=tuple(tuple(range(2 * d * i, 2 * d * (i + 1))) for i in range(p)),
        d=d,
    )
