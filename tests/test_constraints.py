"""Constraint kernel + AL lifecycle oracles (mirrors reference
test/constraints/*: geometry on hand-placed points, the AL expansion
formula, dual/penalty updates, builder wiring)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import algames_tpu as ag
from algames_tpu.constraints import kernels, sets


def _spec(p=3, N=10):
    return ag.spec_from_model(ag.unicycle_game(p=p), N, 0.1)


# ------------------------------------------------------------------ kernels

def test_wall2d_geometry():
    """Hand-placed points vs the gated violation (reference
    test/constraints/wall_constraint.jl semantics)."""
    par = kernels.Wall2DParams(
        x1=jnp.array([0.0]), y1=jnp.array([0.0]),
        x2=jnp.array([0.0]), y2=jnp.array([1.0]),
        xv=jnp.array([1.0]), yv=jnp.array([0.0]), xi=0, yi=1)
    # wall is segment x=0, y in [0,1]; forbidden halfspace x > 0
    pts = jnp.array([
        [0.5, 0.5],    # inside segment span, violating: c = 0.5
        [-0.5, 0.5],   # feasible side: c = -0.5
        [0.5, 2.0],    # beyond segment: gated to 0
        [0.5, -1.0],   # before segment: gated to 0
    ])
    c = kernels.wall2d_evaluate(par, pts)
    np.testing.assert_allclose(c[:, 0], [0.5, -0.5, 0.0, 0.0])
    J = kernels.wall2d_jacobian(par, pts)
    np.testing.assert_allclose(J[0, 0], [1.0, 0.0])
    np.testing.assert_allclose(J[2, 0], [0.0, 0.0])
    # jacobian of ungated point: gates are 1 even on feasible side
    np.testing.assert_allclose(J[1, 0], [1.0, 0.0])


def test_wall3d_geometry():
    par = kernels.Wall3DParams(
        x1=jnp.array([0.0]), y1=jnp.array([0.0]), z1=jnp.array([0.0]),
        x2=jnp.array([1.0]), y2=jnp.array([0.0]), z2=jnp.array([0.0]),
        x3=jnp.array([0.0]), y3=jnp.array([1.0]), z3=jnp.array([0.0]),
        xv=jnp.array([0.0]), yv=jnp.array([0.0]), zv=jnp.array([1.0]),
        xi=0, yi=1, zi=2)
    pts = jnp.array([
        [0.5, 0.5, 0.3],    # above facet: violating c = 0.3
        [0.5, 0.5, -0.3],   # below: c = -0.3
        [2.0, 0.5, 0.3],    # outside facet: 0
    ])
    c = kernels.wall3d_evaluate(par, pts)
    np.testing.assert_allclose(c[:, 0], [0.3, -0.3, 0.0])


def test_cylinder_geometry():
    """z-axis cylinder at origin, l=2, r=1 (reference
    test/constraints/cylinder_constraint.jl semantics)."""
    par = kernels.CylinderParams(
        p1=jnp.array([0.0]), p2=jnp.array([0.0]), p3=jnp.array([0.0]),
        l=jnp.array([2.0]), r=jnp.array([1.0]), axis=(2,), xi=0, yi=1, zi=2)
    pts = jnp.array([
        [0.5, 0.0, 1.0],   # inside: c = 1 - 0.25 = 0.75
        [2.0, 0.0, 1.0],   # outside radius: c = 1 - 4 = -3
        [0.5, 0.0, 3.0],   # beyond length: gated 0
        [0.5, 0.0, -1.0],  # before start: gated 0
    ])
    c = kernels.cylinder_evaluate(par, pts)
    np.testing.assert_allclose(c[:, 0], [0.75, -3.0, 0.0, 0.0])
    J = kernels.cylinder_jacobian(par, pts)
    np.testing.assert_allclose(J[0, 0], [-1.0, 0.0, 0.0])  # -2*t0_x, axis z free


def test_circle_and_collision():
    par = kernels.CircleParams(xc=jnp.array([1.0]), yc=jnp.array([1.0]),
                               radius=jnp.array([0.5]), xi=0, yi=1)
    pts = jnp.array([[1.2, 1.0, 9.0], [3.0, 1.0, 9.0]])
    c = kernels.circle_evaluate(par, pts)
    np.testing.assert_allclose(c[:, 0], [0.25 - 0.04, 0.25 - 4.0])
    col = kernels.CollisionParams(radius=jnp.asarray(0.5), pxi=(0, 1), pxj=(2, 3))
    x = jnp.array([[0.0, 0.0, 0.3, 0.0]])
    c = kernels.collision_evaluate(col, x)
    np.testing.assert_allclose(c[0, 0], 0.25 - 0.09)
    J = kernels.collision_jacobian(col, x)
    np.testing.assert_allclose(J[0, 0], [0.6, 0.0, -0.6, 0.0])


def test_bounds_with_infinite_entries():
    """Infinite bounds are masked to feasible rows with zero Jacobian
    (reference state_bound_constraint.jl finite-index extraction)."""
    par = kernels.make_bound(z_max=np.array([1.0, np.inf]),
                             z_min=np.array([-1.0, -np.inf]))
    zs = jnp.array([[2.0, 100.0]])
    c = kernels.bound_evaluate(par, zs)
    np.testing.assert_allclose(c[0], [1.0, 0.0, -3.0, 0.0])
    J = kernels.bound_jacobian(par, zs)
    np.testing.assert_allclose(J[0, 0], [1.0, 0.0])
    np.testing.assert_allclose(J[0, 1], [0.0, 0.0])
    with pytest.raises(AssertionError):
        kernels.make_bound(z_max=np.array([-1.0]), z_min=np.array([1.0]))


# ------------------------------------------------------- AL expansion oracle

def test_al_expansion_oracle():
    """grad = J'lam + J'(Irho*c); hess = J' Irho J with
    Irho = ((c>=0)|(lam>0)) * mu  (reference
    test/constraints/constraint_derivatives.jl:29-36)."""
    spec = _spec()
    gc = ag.game_constraints(spec)
    gc = ag.add_control_bound(spec, gc, jnp.ones(spec.m), -jnp.ones(spec.m))
    traj = ag.PrimalDual(x=0.1 * jnp.ones((spec.N, spec.n)),
                         u=0.1 * jnp.ones((spec.T, spec.m)),
                         lam=jnp.zeros((spec.p, spec.T, spec.n)))
    blk = gc.control_blocks[0]
    # set duals like the reference test: lam[k] = k+1
    lam = jnp.stack([(k + 1.0) * jnp.ones(2 * spec.m) for k in range(spec.T)])
    blk = sets._replace(blk, lam=lam, mu=1.7 * jnp.ones_like(blk.mu))
    c = sets.block_values(blk, traj)
    np.testing.assert_allclose(c[0], np.concatenate([
        -0.9 * np.ones(spec.m), -1.1 * np.ones(spec.m)]))
    J = sets.block_jacobian(blk, traj)
    np.testing.assert_allclose(J[0], np.vstack([np.eye(spec.m), -np.eye(spec.m)]))
    grad, hess = sets.al_expansion(blk, traj)
    for k in (0, spec.T - 1):
        Irho = np.diag(((np.asarray(c[k]) >= 0) | (np.asarray(blk.lam[k]) > 0))
                       * np.asarray(blk.mu[k]))
        Jk = np.asarray(J[k])
        np.testing.assert_allclose(
            grad[k], Jk.T @ np.asarray(blk.lam[k]) + Jk.T @ Irho @ np.asarray(c[k]),
            rtol=1e-12)
        np.testing.assert_allclose(hess[k], Jk.T @ Irho @ Jk, rtol=1e-12)


def test_dual_and_penalty_updates():
    """lam <- clamp(lam + alpha*mu*c, 0, lam_max); mu <- phi*mu
    (reference constraints_methods.jl:421-445, 329-347)."""
    spec = _spec(p=2)
    gc = ag.game_constraints(spec)
    gc = ag.add_collision_avoidance(spec, gc, 0.25)
    traj = ag.zero_traj(spec, jnp.float64)   # players coincide -> c = r^2 > 0
    gc2 = ag.dual_update(gc, traj)
    blk = gc2.state_blocks[0]
    np.testing.assert_allclose(blk.lam, 0.25)  # 0 + 1*1*(0.5^2)
    gc3 = ag.penalty_update(gc2)
    np.testing.assert_allclose(gc3.state_blocks[0].mu, 10.0)
    # clamp at lam_max
    gc_lo = sets._replace(gc, lam_max=jnp.asarray(0.1))
    gc_lo2 = ag.dual_update(gc_lo, traj)
    np.testing.assert_allclose(gc_lo2.state_blocks[0].lam, 0.1)
    # feasible -> negative c drives lam to 0 (projection)
    traj_far = ag.PrimalDual(
        x=jnp.tile(jnp.arange(spec.n, dtype=jnp.float64)[None], (spec.N, 1)),
        u=jnp.zeros((spec.T, spec.m)), lam=jnp.zeros((spec.p, spec.T, spec.n)))
    gc4 = ag.dual_update(gc2, traj_far)
    np.testing.assert_allclose(gc4.state_blocks[0].lam, 0.0)


def test_update_active_set_and_reset():
    spec = _spec(p=2)
    gc = ag.game_constraints(spec)
    gc = ag.add_collision_avoidance(spec, gc, 0.25)
    traj = ag.zero_traj(spec, jnp.float64)
    gc = ag.update_active_set(gc, traj)
    assert bool(jnp.all(gc.state_blocks[0].active))
    gc = ag.dual_update(gc, traj)
    gc = ag.penalty_update(gc)
    gc = ag.reset_constraints(gc)
    np.testing.assert_allclose(gc.state_blocks[0].lam, 0.0)
    np.testing.assert_allclose(gc.state_blocks[0].mu, 1.0)


def test_partial_resets():
    """reset_penalties keeps duals / reset_constraint_duals keeps penalties
    (reference reset_penalties!/reset_duals!, constraints_methods.jl:296-315)."""
    spec = _spec(p=2)
    gc = ag.game_constraints(spec)
    gc = ag.add_collision_avoidance(spec, gc, 0.25)
    traj = ag.zero_traj(spec, jnp.float64)
    gc = ag.update_active_set(gc, traj)
    gc = ag.dual_update(gc, traj)
    gc = ag.penalty_update(gc)
    lam0 = gc.state_blocks[0].lam
    assert float(jnp.max(lam0)) > 0.0 and float(jnp.max(gc.state_blocks[0].mu)) > 1.0
    gp = ag.reset_penalties(gc)
    np.testing.assert_allclose(gp.state_blocks[0].mu, 1.0)
    np.testing.assert_allclose(gp.state_blocks[0].lam, lam0)
    gd = ag.reset_constraint_duals(gc)
    np.testing.assert_allclose(gd.state_blocks[0].lam, 0.0)
    np.testing.assert_allclose(gd.state_blocks[0].mu,
                               gc.state_blocks[0].mu)


def test_builder_wiring():
    """Which players get which constraints (reference
    test/constraints/constraints_methods.jl:1-50)."""
    spec = _spec(p=3)
    gc = ag.game_constraints(spec)
    gc = ag.add_collision_avoidance(spec, gc, 0.1)
    assert len(gc.state_blocks) == 6        # ordered pairs
    owners = [b.owner for b in gc.state_blocks]
    assert owners == [0, 0, 1, 1, 2, 2]
    gc = ag.add_circle_constraint(spec, gc, jnp.array([1.0]), jnp.array([1.0]),
                                  jnp.array([0.5]))
    assert len(gc.state_blocks) == 9        # one per player
    gc = ag.add_control_bound(spec, gc, jnp.ones(spec.m), -jnp.ones(spec.m))
    assert len(gc.control_blocks) == 1
    # state blocks applied at knots 2..N -> K = N-1 rows
    assert gc.state_blocks[0].lam.shape[0] == spec.N - 1
    assert gc.control_blocks[0].lam.shape[0] == spec.T


def test_velocity_bound():
    """Velocity bound maps to state bounds on the speed index for all players
    (reference velocity_constraint.jl:1-44)."""
    model = ag.unicycle_game(p=2)
    spec = ag.spec_from_model(model, 6, 0.1)
    gc = ag.game_constraints(spec)
    gc = ag.add_velocity_bound(spec, model, gc, np.array([1.0, np.inf]),
                               np.array([-1.0, -np.inf]))
    # player 0 has finite bounds -> added to both players => 2 blocks
    assert len(gc.state_blocks) == 2
    vi = model.velocity_index(0)
    par = gc.state_blocks[0].params
    assert par.mask[vi] and par.mask[spec.n + vi]
    assert sum(par.mask) == 2
    with pytest.raises(NotImplementedError):
        ag.double_integrator_game(p=2).velocity_index(0)


def test_violations():
    spec = _spec(p=2)
    gc = ag.game_constraints(spec)
    gc = ag.add_control_bound(spec, gc, jnp.ones(spec.m), -jnp.ones(spec.m))
    traj = ag.PrimalDual(x=jnp.zeros((spec.N, spec.n)),
                         u=1.5 * jnp.ones((spec.T, spec.m)),
                         lam=jnp.zeros((spec.p, spec.T, spec.n)))
    vio = ag.control_violation(gc, traj)
    np.testing.assert_allclose(vio, 0.5)
    assert ag.state_violation(gc, traj).shape == (spec.N,)


def test_equality_sense():
    """Equality cone: Irho = mu always; dual update clamps to [-lmax, lmax];
    violation is |c| (reference dual_update(::Equality),
    constraints_methods.jl:427-430)."""
    spec = _spec(p=2)
    gc = ag.game_constraints(spec)
    gc = ag.add_control_bound(spec, gc, jnp.ones(spec.m), -jnp.ones(spec.m))
    blk = sets._replace(gc.control_blocks[0], sense="eq")
    gc = sets._replace(gc, control_blocks=(blk,))
    traj = ag.PrimalDual(x=jnp.zeros((spec.N, spec.n)),
                         u=0.5 * jnp.ones((spec.T, spec.m)),
                         lam=jnp.zeros((spec.p, spec.T, spec.n)))
    # c = [u - 1; -1 - u] = [-0.5; -1.5]: feasible as inequality, violated as eq
    vio = ag.control_violation(gc, traj)
    np.testing.assert_allclose(vio, 1.5)
    # dual update can go negative for equalities
    gc2 = ag.dual_update(gc, traj)
    lam = np.asarray(gc2.control_blocks[0].lam)
    assert lam.min() < 0.0
    # expansion penalizes regardless of sign
    grad, hess = sets.al_expansion(gc2.control_blocks[0], traj)
    assert float(jnp.max(jnp.abs(hess))) > 0.0


def test_soc_projection():
    from algames_tpu.constraints.sets import _soc_projection
    v = jnp.asarray([
        [3.0, 4.0, 10.0],    # inside cone (|x|=5 <= 10): unchanged
        [3.0, 4.0, -10.0],   # in polar cone: project to 0
        [3.0, 4.0, 0.0],     # boundary case: scale = 1/2
    ])
    out = np.asarray(_soc_projection(v))
    np.testing.assert_allclose(out[0], [3.0, 4.0, 10.0])
    np.testing.assert_allclose(out[1], [0.0, 0.0, 0.0])
    np.testing.assert_allclose(out[2], [1.5, 2.0, 2.5])


def test_adaptive_penalty_converges_crossing():
    """The opt-in LANCELOT-style schedule solves a crossing scenario that
    diverges under the reference's unconditional x10 ramp."""
    p = 3
    model = ag.unicycle_game(p=p)
    N, dt = 20, 0.1
    spec = ag.spec_from_model(model, N, dt)
    obj = ag.game_objective(
        spec, Q=[10 * jnp.ones(4)] * p, R=[0.1 * jnp.ones(2)] * p,
        xf=[jnp.asarray([2.0, -0.4 * (i - 1), 0.0, 0.0]) for i in range(p)],
        uf=[jnp.zeros(2)] * p, dtype=jnp.float64)
    gc = ag.add_collision_avoidance(spec, ag.game_constraints(spec), 0.1)
    x0 = jnp.asarray([0., 0., 0., -0.4, 0., 0.4, 0., 0., 0., .5, .5, .5])
    opts = ag.Options(reg_0=1e-7, adaptive_penalty=True, outer_iter=12)
    prob = ag.game_problem(N, dt, x0, model, opts, obj, gc)
    out = ag.newton_solve_jit(prob)
    i = int(out.stats.iter)
    assert float(out.stats.sta_vio[i - 1]) < 1e-3
    assert float(out.stats.opt_vio[i - 1]) < 1e-3
