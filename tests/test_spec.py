"""KKT layout spec tests (mirrors reference test/core/stamp.jl +
test/core/newton_core.jl: indices cover and partition 1:S, masks disjoint)."""
import numpy as np
import pytest

import algames_tpu as ag


@pytest.fixture
def spec():
    model = ag.unicycle_game(p=3)
    return ag.spec_from_model(model, N=10, dt=0.1)


def test_S_formula(spec):
    # S = n*p*(N-1) + m*(N-1) + n*(N-1)  (reference problem_size.jl:22)
    N, n, m, p = spec.N, spec.n, spec.m, spec.p
    assert spec.S == n * p * (N - 1) + m * (N - 1) + n * (N - 1)
    assert spec.S == spec.T * spec.W


def test_row_offsets_partition(spec):
    """Vertical index blocks exactly partition 0..S-1
    (reference test/core/newton_core.jl:18-41)."""
    covered = np.zeros(spec.S, dtype=int)
    for i in range(spec.p):
        for k in range(spec.T):
            r = spec.row_stat_x(i, k)
            covered[r:r + spec.n] += 1
            r = spec.row_stat_u(i, k)
            covered[r:r + spec.mi[i]] += 1
    for k in range(spec.T):
        r = spec.row_dyn(k)
        covered[r:r + spec.n] += 1
    assert np.all(covered == 1)


def test_col_offsets_partition(spec):
    covered = np.zeros(spec.S, dtype=int)
    for k in range(spec.T):
        covered[spec.col_x(k):spec.col_x(k) + spec.n] += 1
        covered[spec.col_u(k):spec.col_u(k) + spec.m] += 1
        for i in range(spec.p):
            covered[spec.col_lam(i, k):spec.col_lam(i, k) + spec.n] += 1
    assert np.all(covered == 1)


def test_masks_shapes_and_dyn_overlap(spec):
    """Per-player masks (reference test/core/newton_core.jl:115-160):
    vertical mask = player rows + shared dynamics rows; horizontal mask =
    all states + own controls + own multipliers."""
    n, m, p, T = spec.n, spec.m, spec.p, spec.T
    mi = spec.mi[0]
    vlen = T * (n + mi) + T * n
    hlen = T * n + T * mi + T * n
    vmasks = [spec.vertical_mask(i) for i in range(p)]
    hmasks = [spec.horizontal_mask(i) for i in range(p)]
    for i in range(p):
        assert len(vmasks[i]) == vlen
        assert len(hmasks[i]) == hlen
        assert len(set(vmasks[i].tolist())) == vlen
    # vertical masks pairwise intersect exactly on the dynamics rows
    dyn_rows = set(range(spec.row_dyn(0), spec.S))
    for i in range(p):
        for j in range(i + 1, p):
            inter = set(vmasks[i].tolist()) & set(vmasks[j].tolist())
            assert inter == dyn_rows
    # horizontal masks pairwise intersect exactly on the state columns
    x_cols = set()
    for k in range(T):
        x_cols |= set(range(spec.col_x(k), spec.col_x(k) + n))
    for i in range(p):
        for j in range(i + 1, p):
            inter = set(hmasks[i].tolist()) & set(hmasks[j].tolist())
            assert inter == x_cols


def test_heterogeneous_players_supported():
    """Mixed per-player dims construct and lay out correctly (reference
    NewtonCore handles per-player mi, src/core/newton_core.jl:40-89; solver
    coverage in tests/test_hetero.py)."""
    sp = ag.ProblemSpec(N=5, n=6, m=3, p=2, ni=(4, 2), mi=(2, 1),
                        pu=((0, 1), (2,)), px=((0, 2), (1, 3)),
                        pz=((0, 2, 4), (1, 3, 5)), dt=0.1)
    assert not sp.homogeneous
    assert sp.S == sp.T * sp.W
    # player-1 rows start after ALL of player 0's (n + mi[0]) * T rows
    assert sp.row_stat_x(1, 0) == (sp.n + sp.mi[0]) * sp.T
