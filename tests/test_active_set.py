"""Active-set / equilibrium-subspace oracles (mirrors reference
test/active_set/*: active flags, masks, extended system sizes, nullspace
dimension)."""
import jax
import jax.numpy as jnp
import numpy as np

import algames_tpu as ag
from algames_tpu import active_set as ascore
from algames_tpu.constraints import sets


def _prob(p=3, N=10, radius=1.0):
    model = ag.unicycle_game(p=p)
    dt = 0.1
    spec = ag.spec_from_model(model, N, dt)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 2)
    obj = ag.game_objective(
        spec,
        Q=[jax.random.uniform(ks[0], (4,), jnp.float64) + 0.1] * p,
        R=[jax.random.uniform(ks[1], (2,), jnp.float64) + 0.1] * p,
        xf=[(i + 1.0) * jnp.ones(4) for i in range(p)],
        uf=[2.0 * (i + 1) * jnp.ones(2) for i in range(p)],
        dtype=jnp.float64)
    gc = ag.game_constraints(spec)
    gc = ag.add_collision_avoidance(spec, gc, radius)
    opts = ag.Options()
    x0 = jax.random.uniform(jax.random.PRNGKey(5), (spec.n,), jnp.float64)
    return ag.game_problem(N, dt, x0, model, opts, obj, gc), spec


def test_sizes():
    prob, spec = _prob()
    Sv, Sh = ascore.sizes(spec)
    p, T = spec.p, spec.T
    assert Sv == spec.S + T * p * (p - 1) // 2
    assert Sh == spec.S + T * p * (p - 1)


def test_active_flags():
    """Active = (c >= -tol) | (lam > 0) per (i,j,k) collision entry
    (reference test/active_set/active_set_methods.jl:3-34)."""
    prob, spec = _prob()
    gc = prob.gc
    # Players nearly coincident at ~0 with radius 2 -> everything active.
    traj = ag.zero_traj(spec, jnp.float64)
    gc_a = ag.update_active_set(gc, traj)
    assert ascore.active(gc_a, spec, 0, 1, 1)
    assert ascore.active(gc_a, spec, 0, 1, spec.T)
    # Far apart -> inactive.
    far = ag.PrimalDual(
        x=jnp.tile(1e3 * jnp.arange(spec.n, dtype=jnp.float64)[None],
                   (spec.N, 1)),
        u=jnp.zeros((spec.T, spec.m)),
        lam=jnp.zeros((spec.p, spec.T, spec.n)))
    gc_i = ag.update_active_set(gc, far)
    assert not ascore.active(gc_i, spec, 0, 1, 1)


def test_active_masks_all_or_none():
    """All-active masks cover the full extended system; all-inactive reduce
    to 1:S (reference active_set_methods.jl:36-84)."""
    prob, spec = _prob(radius=1e-8)
    Sv, Sh = ascore.sizes(spec)
    traj = ag.zero_traj(spec, jnp.float64)  # coincident: active (c=r^2>0>= -tol)
    gc_a = ag.update_active_set(prob.gc, traj)
    vmask, hmask = ascore.active_masks(prob, gc_a)
    assert len(vmask) == Sv and len(hmask) == Sh
    far = ag.PrimalDual(
        x=jnp.tile(1e3 * jnp.arange(spec.n, dtype=jnp.float64)[None],
                   (spec.N, 1)),
        u=jnp.zeros((spec.T, spec.m)),
        lam=jnp.zeros((spec.p, spec.T, spec.n)))
    gc_i = ag.update_active_set(prob.gc, far)
    vmask, hmask = ascore.active_masks(prob, gc_i)
    assert len(vmask) == spec.S and len(hmask) == spec.S


def test_extended_residual_and_jacobian():
    prob, spec = _prob()
    Sv, Sh = ascore.sizes(spec)
    traj = ag.zero_traj(spec, jnp.float64)
    r = ascore.extended_residual(prob, traj)
    assert r.shape == (Sv,)
    # appended rows hold the collision constraint values c = r^2 - 0 = 1
    np.testing.assert_allclose(np.asarray(r[spec.S:]), 4.0)  # (1+1)^2
    J = ascore.extended_jacobian(prob, traj)
    assert J.shape == (Sv, Sh)


def test_nullspace_dimension():
    """With all collision constraints active, the nullspace of the masked
    extended Jacobian has dimension (N-1)*p (reference
    active_set_methods.jl:113-116)."""
    prob, spec = _prob(p=3, N=10, radius=1.0)
    traj = ag.zero_traj(spec, jnp.float64)
    # small random positions: distinct, non-collinear (equally-spaced
    # collinear players make the per-knot pair gradients linearly dependent)
    x = 0.01 * jax.random.normal(jax.random.PRNGKey(9), (spec.N, spec.n),
                                 jnp.float64)
    traj = ag.PrimalDual(x=x, u=traj.u, lam=traj.lam)
    ns = ascore.update_nullspace(prob, traj)
    p, N = spec.p, spec.N
    Sh = ascore.sizes(spec)[1]
    assert ns.mat.shape == (Sh, (N - 1) * p)
    assert ns.vec.shape == ((N - 1) * p, Sh)
    # basis vectors actually lie in the kernel
    J = ascore.extended_jacobian(
        ag.GameProblem(spec=spec, model=prob.model, opts=prob.opts,
                       x0=prob.x0, obj=prob.obj,
                       gc=ag.update_active_set(prob.gc, traj)), traj)
    resid = np.asarray(J) @ np.asarray(ns.mat)
    assert np.max(np.abs(resid)) < 1e-8


def test_nullspace_masked_jit_matches_host():
    """The fixed-shape masked nullspace (under jax.jit) finds the same kernel
    dimension as the host-driven version, and its flagged vectors lie in the
    kernel of the active extended Jacobian."""
    prob, spec = _prob(p=3, N=10, radius=1.0)
    x = 0.01 * jax.random.normal(jax.random.PRNGKey(9), (spec.N, spec.n),
                                 jnp.float64)
    z = ag.zero_traj(spec, jnp.float64)
    traj = ag.PrimalDual(x=x, u=z.u, lam=z.lam)
    ns_host = ascore.update_nullspace(prob, traj)
    ns = jax.jit(ascore.update_nullspace_masked)(prob, traj)
    assert int(ns.dim) == ns_host.mat.shape[1] == (spec.N - 1) * spec.p
    # flagged vectors are in the kernel of the (all-active here) Jacobian
    gc_a = ag.update_active_set(prob.gc, traj)
    J = np.asarray(ascore.extended_jacobian(
        ag.GameProblem(spec=spec, model=prob.model, opts=prob.opts,
                       x0=prob.x0, obj=prob.obj, gc=gc_a), traj))
    vecs = np.asarray(ns.vec)[np.asarray(ns.mask)]
    assert np.max(np.abs(J @ vecs.T)) < 1e-7
    # vmap over a batch of trajectories works (fixed shapes throughout)
    xs = jnp.stack([x, x * 1.01])
    batch = ag.PrimalDual(x=xs, u=jnp.stack([z.u] * 2),
                          lam=jnp.stack([z.lam] * 2))
    ns_b = jax.vmap(lambda t: ascore.update_nullspace_masked(prob, t))(batch)
    assert ns_b.vec.shape[0] == 2
    assert int(ns_b.dim[0]) == (spec.N - 1) * spec.p


def test_nullspace_masked_partial_active():
    """With players far apart (nothing active) the kernel reduces to the
    appended-column pinning structure: dim = 0 extra beyond the base system's
    kernel plus the forced-zero duals — i.e. matches the host version."""
    prob, spec = _prob(p=3, N=6, radius=1e-6)
    far = ag.PrimalDual(
        x=jnp.tile(1e3 * jnp.arange(spec.n, dtype=jnp.float64)[None],
                   (spec.N, 1)),
        u=jnp.zeros((spec.T, spec.m)),
        lam=jnp.zeros((spec.p, spec.T, spec.n)))
    ns_host = ascore.update_nullspace(prob, far)
    ns = jax.jit(ascore.update_nullspace_masked)(prob, far)
    assert int(ns.dim) == ns_host.mat.shape[1]


def test_nullspace_dimension_3d_spherical():
    """Quadrotor (pz-based spherical collision) case: get_collision_block
    resolves spherical blocks and the all-active nullspace dimension is
    (N-1) * p(p-1)/2 — each knot appends p(p-1) dual columns and p(p-1)/2
    constraint rows to the (generically full-rank) square base system.  For
    the reference's p=3 planar oracle this equals (N-1)*p
    (active_set_methods.jl:113-116); here p=2 gives (N-1)*1."""
    p, N, dt = 2, 5, 0.1
    model = ag.quadrotor_game(p=p)
    spec = ag.spec_from_model(model, N, dt)
    obj = ag.game_objective(
        spec, Q=[jnp.ones(12)] * p, R=[0.1 * jnp.ones(4)] * p,
        xf=[jnp.zeros(12)] * p, uf=[jnp.zeros(4)] * p, dtype=jnp.float64)
    gc = ag.game_constraints(spec)
    gc = sets.add_spherical_collision_avoidance(spec, gc, 1.0)
    x0 = jnp.zeros(spec.n, jnp.float64)
    prob = ag.game_problem(N, dt, x0, model, ag.Options(), obj, gc)
    assert ascore.get_collision_block(gc, spec, 0, 1) is not None
    z = ag.zero_traj(spec, jnp.float64)
    x = 0.01 * jax.random.normal(jax.random.PRNGKey(3), (spec.N, spec.n),
                                 jnp.float64)
    traj = ag.PrimalDual(x=x, u=z.u, lam=z.lam)
    expect = (N - 1) * p * (p - 1) // 2
    ns_host = ascore.update_nullspace(prob, traj)
    assert ns_host.mat.shape[1] == expect
    ns = jax.jit(ascore.update_nullspace_masked)(prob, traj)
    assert int(ns.dim) == expect
