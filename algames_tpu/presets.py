"""Canonical BASELINE problem configurations.

One builder per BASELINE.md config row (driver targets, `BASELINE.json`):

* :func:`intro_di`          — 2-player double-integrator, N=10 (config 1)
* :func:`flagship_unicycle` — 3-player unicycle merge, N=20 (headline bench)
* :func:`intro_bicycle`     — 3-player bicycle with the full constraint stack
                              (reference ``examples/intro_example.jl:1-80``)

Each returns ``(GameProblem, ProblemSpec)``.  These are the configurations
frozen as golden-trajectory fixtures (``tests/golden/``) and exercised by the
headline bench; keeping them in the package guarantees the bench, the
fixtures, and the examples all solve the *same* problems.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .constraints.sets import (Wall, add_collision_avoidance,
                               add_circle_constraint, add_control_bound,
                               add_state_bound, add_wall_constraint,
                               game_constraints)
from .core.spec import spec_from_model
from .models.bicycle import bicycle_game
from .models.double_integrator import double_integrator_game
from .models.unicycle import unicycle_game
from .objective.objective import add_collision_cost, game_objective
from .problem.options import Options
from .problem.problem import game_problem


def intro_di(dtype=jnp.float64, outer: int = 7, inner: int = 20,
             eps_opt: float | None = None):
    """2-player double-integrator game, N=10 — BASELINE config 1 and the
    reference's linear-dynamics solver oracle
    (``test/problem/solver_methods.jl:27-34`` scaled to p=2)."""
    p, N, dt = 2, 10, 0.1
    model = double_integrator_game(p=p, d=2)
    spec = spec_from_model(model, N, dt)
    # Lane-swap scenario: the collision-avoidance constraint is ACTIVE at the
    # equilibrium (players cross), so the fixture pins real AL behavior.
    obj = game_objective(
        spec,
        Q=[jnp.ones(4, dtype)] * p,
        R=[0.1 * jnp.ones(2, dtype)] * p,
        xf=[jnp.asarray([1.0, 0.4 * (p - 1 - i), 0.0, 0.0], dtype)
            for i in range(p)],
        uf=[jnp.zeros(2, dtype)] * p,
        dtype=dtype)
    gc = game_constraints(spec, dtype=dtype)
    gc = add_collision_avoidance(spec, gc, 0.2)
    gc = add_control_bound(spec, gc, 2 * jnp.ones(2 * p, dtype),
                           -2 * jnp.ones(2 * p, dtype))
    opts = Options(outer_iter=outer, inner_iter=inner,
                   eps_opt=_default_eps_opt(dtype, eps_opt))
    # Interleaved DI layout: [x (p) | y (p) | vx (p) | vy (p)].
    x0 = jnp.asarray(np.concatenate([np.zeros(p), 0.4 * np.arange(p),
                                     np.zeros(2 * p)]), dtype)
    return game_problem(N, dt, x0, model, opts, obj, gc), spec


def flagship_unicycle(dtype=jnp.float64, p: int = 3, N: int = 20,
                      outer: int = 7, inner: int = 20,
                      eps_opt: float | None = None):
    """3-player unicycle merge with collision avoidance + control bounds —
    the BASELINE.json headline throughput config (same problem as
    ``__graft_entry__._flagship_problem``)."""
    dt = 0.1
    model = unicycle_game(p=p)
    spec = spec_from_model(model, N, dt)
    obj = game_objective(
        spec,
        Q=[jnp.ones(4, dtype)] * p,
        R=[0.1 * jnp.ones(2, dtype)] * p,
        xf=[jnp.asarray([2.0, 0.4 * i, 0.0, 0.3], dtype) for i in range(p)],
        uf=[jnp.zeros(2, dtype)] * p,
        dtype=dtype)
    gc = game_constraints(spec, dtype=dtype)
    gc = add_collision_avoidance(spec, gc, 0.08)
    gc = add_control_bound(spec, gc, 2 * jnp.ones(2 * p, dtype),
                           -2 * jnp.ones(2 * p, dtype))
    opts = Options(outer_iter=outer, inner_iter=inner,
                   eps_opt=_default_eps_opt(dtype, eps_opt))
    x0 = jnp.asarray(
        np.concatenate([np.zeros(p), 0.4 * np.arange(p), np.zeros(p),
                        0.5 * np.ones(p)]), dtype)
    return game_problem(N, dt, x0, model, opts, obj, gc), spec


def intro_bicycle(dtype=jnp.float64, outer: int = 7, inner: int = 20,
                  eps_opt: float | None = None):
    """3-player bicycle game with the full constraint stack — collision cost,
    collision avoidance, control/state bounds, a wall, circle obstacles
    (reference ``examples/intro_example.jl:10-67``)."""
    p, N, dt = 3, 20, 0.1
    model = bicycle_game(p=p)
    spec = spec_from_model(model, N, dt)
    obj = game_objective(
        spec,
        Q=[10 * jnp.ones(model.ni[i], dtype) for i in range(p)],
        R=[0.1 * jnp.ones(model.mi[i], dtype) for i in range(p)],
        xf=[jnp.asarray(v, dtype) for v in
            ([2, +0.4, 0, 0], [2, 0.0, 0, 0], [3, -0.4, 0, 0])],
        uf=[jnp.zeros(model.mi[i], dtype) for i in range(p)],
        dtype=dtype)
    obj = add_collision_cost(spec, obj, radius=jnp.ones(p, dtype),
                             mu=5.0 * jnp.ones(p, dtype))
    gc = game_constraints(spec, dtype=dtype)
    gc = add_collision_avoidance(spec, gc, 0.08)
    gc = add_control_bound(spec, gc, 5 * jnp.ones(spec.m, dtype),
                           -5 * jnp.ones(spec.m, dtype))
    gc = add_state_bound(spec, gc, 0, 5 * np.ones(spec.n),
                         -5 * np.ones(spec.n))
    gc = add_wall_constraint(
        spec, gc, [Wall([0.0, -0.4], [1.0, -0.4], [0.0, -1.0])])
    gc = add_circle_constraint(spec, gc, jnp.asarray([1.0, 2.0, 3.0]),
                               jnp.asarray([1.0, 2.0, 3.0]),
                               jnp.asarray([0.1, 0.2, 0.3]))
    opts = Options(outer_iter=outer, inner_iter=inner,
                   eps_opt=_default_eps_opt(dtype, eps_opt))
    x0 = jnp.asarray([0.1, 0.0, 0.5, -0.4, 0.0, 0.7,
                      0.0, 0.0, 0.0, 0.0, 0.0, 0.0], dtype)
    return game_problem(N, dt, x0, model, opts, obj, gc), spec


def _default_eps_opt(dtype, eps_opt):
    """f32 runs gate stationarity at 1e-2: the f32 floor of the AL terms with
    mu up to 1e7 is ~3e-3 (see ``__graft_entry__._flagship_problem``); f64
    keeps the reference default 1e-3."""
    if eps_opt is not None:
        return eps_opt
    return 1e-2 if dtype == jnp.float32 else 1e-3


PRESETS = {
    "di2_N10": intro_di,
    "uni3_N20": flagship_unicycle,
    "bike3_N20": intro_bicycle,
}
