"""XVA layer: closed-form exposure oracle vs split-domain quadrature vs
MC, PFE exceedance calibration, CVA + hazard delta, jvp/CRN-FD/oracle
vega agreement, sharding invariance, rqmc."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hullwhite_tpu import xva, tiny_config
from hullwhite_tpu.models import hull_white as hw
from hullwhite_tpu.models import oracles

CFG = tiny_config(n_paths=1 << 14, path_block=1 << 12)
KEY = jax.random.key(808)


@pytest.fixture(scope="module")
def market():
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    P = np.array([oracles.bond_price(CFG, T) for T in Ts])
    f = oracles.forward_rate(CFG, Ts)
    return hw.MarketCurve(P=jnp.asarray(P, jnp.float32),
                          f=jnp.asarray(f, jnp.float32))


@pytest.mark.parametrize("payer", [False, True])
def test_oracle_matches_split_quadrature(market, payer):
    """Strike-root closed form == Gauss-Legendre over the paying side
    (independent integration route), to fp64 quadrature precision."""
    o = xva.exposure_oracle(CFG, market, payer=payer)
    for j, t in enumerate(o.dates):
        q = xva.ee_quadrature(CFG, market, t, payer=payer)
        assert abs(o.ee[j] - q) < 1e-14
        q48 = xva.ee_quadrature(CFG, market, t, payer=payer, n_quad=48)
        assert abs(q - q48) < 1e-14     # spectral: the kink is excluded


def test_first_date_is_a_swaption(market):
    """EE(T_0) is a European swaption expiring at the swap start —
    pinned against the continuous-law Jamshidian price (the discrete
    trapezoid law differs by the documented ~1e-5 discretization gap)."""
    from hullwhite_tpu.instruments import jamshidian_price, swap_fixed_leg

    o = xva.exposure_oracle(CFG, market, rate=0.02, tenor=4.0)
    sched = swap_fixed_leg(CFG, 0.02, 4.0)
    assert abs(o.ee[0] - jamshidian_price(CFG, market, sched, 1.0)) < 2e-5
    op = xva.exposure_oracle(CFG, market, rate=0.02, tenor=4.0, payer=True)
    assert abs(op.ee[0] - jamshidian_price(CFG, market, sched, 1.0,
                                           payer=True)) < 2e-5


@pytest.mark.parametrize("payer", [False, True])
def test_mc_matches_oracle(market, payer):
    o = xva.exposure_oracle(CFG, market, payer=payer)
    r = xva.price_exposure(CFG, KEY, market, payer=payer, n_blocks=4)
    ee = np.asarray(r.profile.ee)
    se = np.asarray(r.profile.ee_std_error)
    for j in range(len(o.dates)):
        assert abs(ee[j] - o.ee[j]) < 5.0 * se[j] + 1e-7
    assert abs(float(r.cva) - o.cva) < 5.0 * float(r.std_error) + 1e-9
    assert float(r.std_error) < float(r.raw_std_error)  # CV helps
    assert abs(float(r.hazard_delta) - o.hazard_delta) \
        < 0.01 * abs(o.hazard_delta)
    assert abs(float(r.profile.epe) - o.epe) < 5e-4


def test_pfe_exceedance_calibration(market):
    """The closed-form PFE level must be exceeded by ~(1 - q) of the
    sampled paths — the MC validates the monotone quantile map."""
    q = 0.95
    r = xva.price_exposure(CFG, KEY, market, quantile=q, n_blocks=4)
    n = r.profile.n_paths
    tol = 5.0 * math.sqrt(q * (1 - q) / n) + 2e-3  # antithetic pairing
    exceed = np.asarray(r.profile.exceed)
    assert np.all(np.abs(exceed - (1 - q)) < tol)
    o = xva.exposure_oracle(CFG, market, quantile=q)
    assert np.allclose(np.asarray(r.profile.pfe), o.pfe, atol=1e-6)
    # PFE dominates EE (a quantile of the positive part vs its
    # discounted mean at these maturities)
    assert np.all(np.asarray(r.profile.pfe) > np.asarray(r.profile.ee))


def test_sharded_matches_single(market):
    from hullwhite_tpu.parallel import mesh as pmesh

    kw = dict(n_paths=1 << 12, n_blocks=8)
    single = xva.price_exposure(CFG, KEY, market, **kw)
    shard = xva.price_exposure(CFG, KEY, market, mesh=pmesh.path_mesh(),
                               **kw)
    assert abs(float(single.cva) - float(shard.cva)) < 1e-9
    assert np.allclose(np.asarray(single.profile.ee),
                       np.asarray(shard.profile.ee), atol=1e-7)


def test_rqmc_runs_and_guards(market):
    with pytest.raises(ValueError):
        xva.price_exposure(CFG, KEY, market, rqmc=True, n_blocks=1)
    r = xva.price_exposure(CFG, KEY, market, rqmc=True, n_blocks=4,
                           n_paths=1 << 12)
    o = xva.exposure_oracle(CFG, market)
    assert np.isfinite(float(r.std_error))
    assert abs(float(r.cva) - o.cva) < 6.0 * float(r.std_error) + 1e-8


def test_vega_three_ways(market):
    v = xva.vega_cva(CFG, KEY, market, n_blocks=2)
    # jvp and CRN-FD differentiate the same kernel: tight agreement
    assert abs(float(v.vega) - float(v.fd_vega)) \
        < 1e-3 * abs(v.oracle_vega) + 1e-7
    # both sit on the fp64 closed-form FD within MC noise
    assert abs(float(v.vega) - v.oracle_vega) < 0.02 * abs(v.oracle_vega)


def test_hazard_and_recovery_scaling(market):
    """CVA scales linearly in LGD and the hazard delta is the actual
    derivative of the closed-form CVA in the hazard rate."""
    o = xva.exposure_oracle(CFG, market, recovery=0.4)
    o0 = xva.exposure_oracle(CFG, market, recovery=0.0)
    assert abs(o.cva - 0.6 * o0.cva) < 1e-15
    eps = 1e-6
    up = xva.exposure_oracle(CFG, market, hazard=0.02 + eps).cva
    dn = xva.exposure_oracle(CFG, market, hazard=0.02 - eps).cva
    assert abs(o.hazard_delta - (up - dn) / (2 * eps)) < 1e-8


# ---------------------------------------------------------------------------
# G2++ twin
# ---------------------------------------------------------------------------

from hullwhite_tpu.models import g2pp  # noqa: E402

G2 = g2pp.G2Params()


def test_g2_first_date_is_the_g2_swaption(market):
    """EE(T_0) must reproduce swaption_g2_analytic exactly (same
    decomposition, same quadrature) — a code-path identity."""
    from hullwhite_tpu.instruments import swap_fixed_leg

    o = xva.exposure_oracle_g2(CFG, G2, market)
    sched = swap_fixed_leg(CFG, 0.02, 4.0)
    assert abs(o.ee[0] - g2pp.swaption_g2_analytic(CFG, G2, market,
                                                   sched, 1.0)) < 1e-14
    op = xva.exposure_oracle_g2(CFG, G2, market, payer=True)
    assert abs(op.ee[0] - g2pp.swaption_g2_analytic(
        CFG, G2, market, sched, 1.0, payer=True)) < 1e-14


@pytest.mark.parametrize("payer", [False, True])
def test_g2_mc_matches_oracle(market, payer):
    o = xva.exposure_oracle_g2(CFG, G2, market, payer=payer)
    r = xva.price_exposure_g2(CFG, G2, KEY, market, payer=payer,
                              n_blocks=4)
    ee = np.asarray(r.profile.ee)
    se = np.asarray(r.profile.ee_std_error)
    for j in range(len(o.dates)):
        assert abs(ee[j] - o.ee[j]) < 5.0 * se[j] + 1e-7
    assert abs(float(r.cva) - o.cva) < 5.0 * float(r.std_error) + 1e-9
    assert float(r.std_error) < float(r.raw_std_error)


def test_g2_pfe_exceedance(market):
    """The bisected conditional-CDF PFE level must be exceeded by
    ~(1 - q) of the sampled paths."""
    r = xva.price_exposure_g2(CFG, G2, KEY, market, n_blocks=4)
    n = r.profile.n_paths
    tol = 5.0 * math.sqrt(0.05 * 0.95 / n) + 2e-3
    assert np.all(np.abs(np.asarray(r.profile.exceed) - 0.05) < tol)


def test_g2_sharded_matches_single(market):
    from hullwhite_tpu.parallel import mesh as pmesh

    kw = dict(n_paths=1 << 12, n_blocks=8)
    single = xva.price_exposure_g2(CFG, G2, KEY, market, **kw)
    shard = xva.price_exposure_g2(CFG, G2, KEY, market,
                                  mesh=pmesh.path_mesh(), **kw)
    assert abs(float(single.cva) - float(shard.cva)) < 1e-9
    assert np.allclose(np.asarray(single.profile.ee),
                       np.asarray(shard.profile.ee), atol=1e-7)


def test_g2_vega_matches_oracle(market):
    v = xva.vega_cva_g2(CFG, G2, KEY, market, n_blocks=2)
    assert abs(float(v.vega) - v.oracle_vega) < 0.05 * abs(v.oracle_vega)


# ---------------------------------------------------------------------------
# Netting sets
# ---------------------------------------------------------------------------

LEGS = ((0.02, 4.0, False), (0.012, 3.0, True), (0.03, 2.0, False))


def test_netting_one_leg_reduces_to_single(market):
    o1 = xva.netting_oracle(CFG, market, ((0.02, 4.0, False),))
    os = xva.exposure_oracle(CFG, market)
    assert max(abs(a - b) for a, b in zip(o1.ee, os.ee)) < 1e-14
    assert max(abs(a - b) for a, b in zip(o1.pfe, os.pfe)) < 1e-12
    o1p = xva.netting_oracle(CFG, market, ((0.02, 4.0, True),))
    osp = xva.exposure_oracle(CFG, market, payer=True)
    assert max(abs(a - b) for a, b in zip(o1p.ee, osp.ee)) < 1e-14


def test_netting_benefit_nonnegative(market):
    """|sum V_l|^+ <= sum |V_l|^+ pathwise, so the netted EE (and CVA)
    can never exceed the standalone sum."""
    on = xva.netting_oracle(CFG, market, LEGS)
    stand = [xva.exposure_oracle(CFG, market, rate=r, tenor=tn, payer=p)
             for (r, tn, p) in LEGS]
    for j in range(len(on.dates)):
        ssum = sum(o.ee[j] for o in stand if j < len(o.ee))
        assert on.ee[j] <= ssum + 1e-12
    assert on.cva < sum(o.cva for o in stand)


def test_netting_mc_matches_oracle(market):
    on = xva.netting_oracle(CFG, market, LEGS)
    r = xva.price_netting(CFG, KEY, market, LEGS, n_blocks=4)
    ee = np.asarray(r.profile.ee)
    se = np.asarray(r.profile.ee_std_error)
    for j in range(len(on.dates)):
        assert abs(ee[j] - on.ee[j]) < 5.0 * se[j] + 1e-7
    assert abs(float(r.cva) - on.cva) < 5.0 * float(r.std_error) + 1e-9
    assert float(r.std_error) < float(r.raw_std_error)
    n = r.profile.n_paths
    tol = 5.0 * math.sqrt(0.05 * 0.95 / n) + 2e-3
    assert np.all(np.abs(np.asarray(r.profile.exceed) - 0.05) < tol)


@pytest.mark.slow
def test_netting_sharded_matches_single(market):
    from hullwhite_tpu.parallel import mesh as pmesh

    kw = dict(n_paths=1 << 12, n_blocks=8)
    single = xva.price_netting(CFG, KEY, market, LEGS, **kw)
    shard = xva.price_netting(CFG, KEY, market, LEGS,
                              mesh=pmesh.path_mesh(), **kw)
    assert abs(float(single.cva) - float(shard.cva)) < 1e-9


# ---------------------------------------------------------------------------
# Bilateral XVA
# ---------------------------------------------------------------------------


def test_bilateral_ene_identity(market):
    """ENE_j = EE_j - E[D_j V_j] (the oracle's route) must equal the
    DIRECT segment integration of the discounted negative part."""
    b = xva.bilateral_oracle(CFG, market, LEGS)
    tables = hw.step_tables(CFG, CFG.sigma, CFG.sigma, jnp.float32)
    sig = float(tables.sig_st)
    rA, rB, iA, iB = xva._det_rI(CFG, b.dates)
    stats = xva._date_stats(CFG, b.dates)
    for j, t in enumerate(b.dates):
        lams, Bs, K = xva._portfolio_terms(CFG, market, 
            tuple(xva.SwapLeg(*l) for l in LEGS), t, CFG.sigma, 1.0, CFG.s1)
        uu, ww, uw = stats[j]
        v_r, v_I, c_rI = sig * sig * uu, sig * sig * ww, sig * sig * uw
        mu_t = rA[j] - c_rI
        s_r = math.sqrt(v_r)
        w0 = math.exp(-iA[j] + 0.5 * v_I)
        segs = xva._v_segments(-lams, Bs, -K, mu_t, s_r)
        ene_direct = w0 * xva._ee_segments(-lams, Bs, -K, mu_t, s_r, segs)
        assert abs(b.ene[j] - ene_direct) < 1e-12


def test_bilateral_degenerates_to_unilateral(market):
    """hazard_own -> 0 kills DVA and the own-survival weights, so BCVA
    collapses to the unilateral netted CVA; zero spreads kill FVA."""
    b = xva.bilateral_oracle(CFG, market, LEGS, hazard_own=0.0,
                             spread_borrow=0.0, spread_lend=0.0)
    on = xva.netting_oracle(CFG, market, LEGS)
    assert abs(b.bcva - on.cva) < 1e-15
    assert b.dva == 0.0 and b.fva == 0.0 and b.fca == 0.0


def test_bilateral_mirror_antisymmetry(market):
    """Flipping every leg payer<->receiver negates V pathwise, so with
    (hazard, recovery, borrow/lend) roles swapped the oracle BCVA and
    FVA change sign exactly."""
    kw = dict(hazard=0.02, recovery=0.4, hazard_own=0.035,
              recovery_own=0.25, spread_borrow=0.004, spread_lend=0.007)
    b = xva.bilateral_oracle(CFG, market, LEGS, **kw)
    mirror = tuple((r, tn, not p) for (r, tn, p) in LEGS)
    bm = xva.bilateral_oracle(CFG, market, mirror, hazard=0.035,
                              recovery=0.25, hazard_own=0.02,
                              recovery_own=0.4, spread_borrow=0.007,
                              spread_lend=0.004)
    assert abs(bm.bcva + b.bcva) < 1e-14
    assert abs(bm.fva + b.fva) < 1e-14
    assert abs(bm.cva - b.dva) < 1e-14 and abs(bm.dva - b.cva) < 1e-14


def test_bilateral_mc_matches_oracle(market):
    kw = dict(hazard_own=0.03, recovery_own=0.3, spread_borrow=0.006,
              spread_lend=0.002)
    b = xva.bilateral_oracle(CFG, market, LEGS, **kw)
    r = xva.price_bilateral(CFG, KEY, market, LEGS, n_blocks=4, **kw)
    assert abs(float(r.bcva) - b.bcva) < 5.0 * float(r.bcva_se) + 1e-9
    assert abs(float(r.fva) - b.fva) < 5.0 * float(r.fva_se) + 1e-9
    ene = np.asarray(r.ene)
    se = np.asarray(r.base.profile.ee_std_error)
    for j in range(len(b.dates)):
        assert abs(ene[j] - b.ene[j]) < 5.0 * se[j] + 1e-6
    assert abs(float(r.cva) - b.cva) < 5e-5
    assert abs(float(r.dva) - b.dva) < 5e-5


def test_bilateral_symmetric_funding_collapses(market):
    """With s_b == s_l the FVA sample is LINEAR in the discounted value,
    so the channel CV is exact: FVA == oracle to fp32, SE ~ 0."""
    r = xva.price_bilateral(CFG, KEY, market, LEGS, spread_borrow=0.005,
                            spread_lend=0.005, n_blocks=2)
    b = xva.bilateral_oracle(CFG, market, LEGS, spread_borrow=0.005,
                             spread_lend=0.005)
    assert abs(float(r.fva) - b.fva) < 1e-7
    assert float(r.fva_se) < 1e-7


@pytest.mark.slow
def test_bilateral_sharded_matches_single(market):
    from hullwhite_tpu.parallel import mesh as pmesh

    kw = dict(n_paths=1 << 12, n_blocks=8, hazard_own=0.03)
    single = xva.price_bilateral(CFG, KEY, market, LEGS, **kw)
    shard = xva.price_bilateral(CFG, KEY, market, LEGS,
                                mesh=pmesh.path_mesh(), **kw)
    assert abs(float(single.bcva) - float(shard.bcva)) < 1e-9
    assert abs(float(single.fva) - float(shard.fva)) < 1e-10


# ---------------------------------------------------------------------------
# Collateral (CSA: threshold H, margin-period-of-risk lag)
# ---------------------------------------------------------------------------


def test_collateral_huge_threshold_is_uncollateralized(market):
    """H above any reachable value posts nothing: the CSA profile must
    reproduce the uncollateralized netting oracle exactly."""
    oc = xva.collateral_oracle(CFG, market, LEGS, threshold=10.0, lag=1)
    on = xva.netting_oracle(CFG, market, LEGS)
    assert max(abs(a - b) for a, b in zip(oc.ee, on.ee)) < 1e-13
    assert abs(oc.cva - on.cva) < 1e-14
    assert max(abs(a - b) for a, b in zip(oc.pfe, on.pfe)) < 1e-10


def test_collateral_lag0_zero_threshold_kills_exposure(market):
    """H = 0, lag = 0 is perfect instantaneous collateralization:
    exposure min(V, 0)^+ = 0 at every date."""
    oc = xva.collateral_oracle(CFG, market, LEGS, threshold=0.0, lag=0)
    assert all(abs(e) < 1e-15 for e in oc.ee)
    assert abs(oc.cva) < 1e-15
    assert all(p == 0.0 for p in oc.pfe)


def test_collateral_monotone_and_dominated(market):
    """Pathwise (V - (V_s - H)^+)^+ is nondecreasing in H and never
    exceeds V^+, so EE is monotone in the threshold and the CSA CVA is
    bounded by the uncollateralized one, per date and in aggregate."""
    on = xva.netting_oracle(CFG, market, LEGS)
    prev = None
    for H in (0.002, 0.01, 0.05):
        oc = xva.collateral_oracle(CFG, market, LEGS, threshold=H, lag=1)
        for j in range(len(on.dates)):
            assert oc.ee[j] <= on.ee[j] + 1e-12
            if prev is not None:
                assert prev.ee[j] <= oc.ee[j] + 1e-12
        assert oc.cva <= on.cva + 1e-14
        prev = oc


def test_collateral_oracle_vs_bruteforce_trapezoid(market):
    """The lag>=1 EE (panel Gauss-Legendre outer x segment closed-form
    inner) is pinned against a dense 2-d trapezoid over the tilted
    joint law of (r_s, r_t) — a fully independent integration route
    (no segment decomposition, no conditioning tricks)."""
    H, lag, j = 0.01, 1, 2
    legs = tuple(xva.SwapLeg(*l) for l in LEGS)
    oc = xva.collateral_oracle(CFG, market, LEGS, threshold=H, lag=lag)
    t, s = oc.dates[j], oc.dates[j - lag]
    sig = float(hw.step_tables(CFG, CFG.sigma, CFG.sigma,
                               jnp.float32).sig_st)
    rA, rB, iA, iB = xva._det_rI(CFG, oc.dates)
    uu, ww, uw = xva._date_stats(CFG, oc.dates)[j]
    v_r, v_I, c_rI = sig * sig * uu, sig * sig * ww, sig * sig * uw
    uu_s, cov_st, cov_sI = xva._pair_stats(CFG, s, t)
    v_s = sig * sig * uu_s
    c_st, c_sI = sig * sig * cov_st, sig * sig * cov_sI
    mu_s, mu_t = rA[j - lag] - c_sI, rA[j] - c_rI
    sd_s = math.sqrt(v_s)
    rho = c_st / v_s
    s_cond = math.sqrt(v_r - c_st * c_st / v_s)
    w0 = math.exp(-iA[j] + 0.5 * v_I)
    lams_t, Bs_t, K_t = xva._portfolio_terms(CFG, market, legs, t,
                                             CFG.sigma, 1.0, CFG.s1)
    lams_s, Bs_s, K_s = xva._portfolio_terms(CFG, market, legs, s,
                                             CFG.sigma, 1.0, CFG.s1)
    nx = 2401
    gx = np.linspace(-8.0, 8.0, nx)
    wx = np.full(nx, gx[1] - gx[0])
    wx[0] = wx[-1] = 0.5 * (gx[1] - gx[0])
    dens = np.exp(-0.5 * gx * gx) / math.sqrt(2.0 * math.pi)
    rs = mu_s + sd_s * gx
    Vs = np.exp(-np.outer(rs, Bs_s)) @ lams_s - K_s
    C = np.maximum(Vs - H, 0.0)
    total = 0.0
    for x, wq, cx in zip(rs, wx * dens, C):
        rt = (mu_t + rho * (x - mu_s)) + s_cond * gx
        Vt = np.exp(-np.outer(rt, Bs_t)) @ lams_t - K_t
        total += wq * float((wx * dens) @ np.maximum(Vt - cx, 0.0))
    assert abs(w0 * total - oc.ee[j]) < 5e-7


@pytest.mark.parametrize("lag", [0, 1, 2])
def test_collateral_mc_matches_oracle(market, lag):
    oc = xva.collateral_oracle(CFG, market, LEGS, lag=lag)
    r = xva.price_collateral(CFG, KEY, market, LEGS, lag=lag, n_blocks=4)
    ee = np.asarray(r.profile.ee)
    se = np.asarray(r.profile.ee_std_error)
    for j in range(len(oc.dates)):
        assert abs(ee[j] - oc.ee[j]) < 5.0 * se[j] + 1e-7
    assert abs(float(r.cva) - oc.cva) < 5.0 * float(r.std_error) + 1e-9
    if lag == 1:
        n = r.profile.n_paths
        tol = 5.0 * math.sqrt(0.05 * 0.95 / n) + 2e-3
        exceed = np.asarray(r.profile.exceed)[lag:]
        assert np.all(np.abs(exceed - 0.05) < tol)


@pytest.mark.slow
def test_collateral_sharded_matches_single(market):
    from hullwhite_tpu.parallel import mesh as pmesh

    kw = dict(n_paths=1 << 12, n_blocks=8)
    single = xva.price_collateral(CFG, KEY, market, LEGS, **kw)
    shard = xva.price_collateral(CFG, KEY, market, LEGS,
                                 mesh=pmesh.path_mesh(), **kw)
    assert abs(float(single.cva) - float(shard.cva)) < 1e-9
    assert np.allclose(np.asarray(single.profile.ee),
                       np.asarray(shard.profile.ee), atol=1e-7)

# ---------------------------------------------------------------------------
# G2++ netting + bilateral twins
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_g2_netting_one_leg_reduces_to_single(market):
    """A one-leg 'portfolio' must reproduce exposure_oracle_g2 (Newton
    single-root inner) to quadrature precision, both sides."""
    o1 = xva.netting_oracle_g2(CFG, G2, market, ((0.02, 4.0, False),))
    os = xva.exposure_oracle_g2(CFG, G2, market)
    assert max(abs(a - b) for a, b in zip(o1.ee, os.ee)) < 1e-12
    assert max(abs(a - b) for a, b in zip(o1.pfe, os.pfe)) < 1e-10
    o1p = xva.netting_oracle_g2(CFG, G2, market, ((0.02, 4.0, True),))
    osp = xva.exposure_oracle_g2(CFG, G2, market, payer=True)
    assert max(abs(a - b) for a, b in zip(o1p.ee, osp.ee)) < 1e-12


def test_g2_netting_benefit_nonnegative(market):
    on = xva.netting_oracle_g2(CFG, G2, market, LEGS)
    stand = [xva.exposure_oracle_g2(CFG, G2, market, rate=r, tenor=tn,
                                    payer=p) for (r, tn, p) in LEGS]
    for j in range(len(on.dates)):
        ssum = sum(o.ee[j] for o in stand if j < len(o.ee))
        assert on.ee[j] <= ssum + 1e-10
    assert on.cva < sum(o.cva for o in stand)


def test_g2_netting_mc_matches_oracle(market):
    on = xva.netting_oracle_g2(CFG, G2, market, LEGS)
    r = xva.price_netting_g2(CFG, G2, KEY, market, LEGS, n_blocks=4)
    ee = np.asarray(r.profile.ee)
    se = np.asarray(r.profile.ee_std_error)
    for j in range(len(on.dates)):
        assert abs(ee[j] - on.ee[j]) < 5.0 * se[j] + 1e-7
    assert abs(float(r.cva) - on.cva) < 5.0 * float(r.std_error) + 1e-9
    assert float(r.std_error) < float(r.raw_std_error)
    n = r.profile.n_paths
    tol = 5.0 * math.sqrt(0.05 * 0.95 / n) + 2e-3
    assert np.all(np.abs(np.asarray(r.profile.exceed) - 0.05) < tol)


def test_g2_netting_sharded_matches_single(market):
    from hullwhite_tpu.parallel import mesh as pmesh

    kw = dict(n_paths=1 << 12, n_blocks=8)
    single = xva.price_netting_g2(CFG, G2, KEY, market, LEGS, **kw)
    shard = xva.price_netting_g2(CFG, G2, KEY, market, LEGS,
                                 mesh=pmesh.path_mesh(), **kw)
    assert abs(float(single.cva) - float(shard.cva)) < 1e-9
    assert np.allclose(np.asarray(single.profile.ee),
                       np.asarray(shard.profile.ee), atol=1e-7)


def test_g2_bilateral_degenerates_to_unilateral(market):
    b = xva.bilateral_oracle_g2(CFG, G2, market, LEGS, hazard_own=0.0,
                                spread_borrow=0.0, spread_lend=0.0)
    on = xva.netting_oracle_g2(CFG, G2, market, LEGS)
    assert abs(b.bcva - on.cva) < 1e-15
    assert b.dva == 0.0 and b.fva == 0.0 and b.fca == 0.0


def test_g2_bilateral_mirror_antisymmetry(market):
    kw = dict(hazard=0.02, recovery=0.4, hazard_own=0.035,
              recovery_own=0.25, spread_borrow=0.004, spread_lend=0.007)
    b = xva.bilateral_oracle_g2(CFG, G2, market, LEGS, **kw)
    mirror = tuple((r, tn, not p) for (r, tn, p) in LEGS)
    bm = xva.bilateral_oracle_g2(CFG, G2, market, mirror, hazard=0.035,
                                 recovery=0.25, hazard_own=0.02,
                                 recovery_own=0.4, spread_borrow=0.007,
                                 spread_lend=0.004)
    assert abs(bm.bcva + b.bcva) < 1e-12
    assert abs(bm.fva + b.fva) < 1e-12
    assert abs(bm.cva - b.dva) < 1e-12 and abs(bm.dva - b.cva) < 1e-12


def test_g2_bilateral_mc_matches_oracle(market):
    kw = dict(hazard_own=0.03, recovery_own=0.3, spread_borrow=0.006,
              spread_lend=0.002)
    b = xva.bilateral_oracle_g2(CFG, G2, market, LEGS, **kw)
    r = xva.price_bilateral_g2(CFG, G2, KEY, market, LEGS, n_blocks=4,
                               **kw)
    assert abs(float(r.bcva) - b.bcva) < 5.0 * float(r.bcva_se) + 1e-9
    assert abs(float(r.fva) - b.fva) < 5.0 * float(r.fva_se) + 1e-9
    ene = np.asarray(r.ene)
    se = np.asarray(r.base.profile.ee_std_error)
    for j in range(len(b.dates)):
        assert abs(ene[j] - b.ene[j]) < 5.0 * se[j] + 1e-6
    assert abs(float(r.cva) - b.cva) < 5e-5
    assert abs(float(r.dva) - b.dva) < 5e-5


def test_g2_bilateral_symmetric_funding_collapses(market):
    r = xva.price_bilateral_g2(CFG, G2, KEY, market, LEGS,
                               spread_borrow=0.005, spread_lend=0.005,
                               n_blocks=2)
    b = xva.bilateral_oracle_g2(CFG, G2, market, LEGS,
                                spread_borrow=0.005, spread_lend=0.005)
    assert abs(float(r.fva) - b.fva) < 1e-7
    assert float(r.fva_se) < 1e-7


def test_g2_bilateral_sharded_matches_single(market):
    from hullwhite_tpu.parallel import mesh as pmesh

    kw = dict(n_paths=1 << 12, n_blocks=8, hazard_own=0.03)
    single = xva.price_bilateral_g2(CFG, G2, KEY, market, LEGS, **kw)
    shard = xva.price_bilateral_g2(CFG, G2, KEY, market, LEGS,
                                   mesh=pmesh.path_mesh(), **kw)
    assert abs(float(single.bcva) - float(shard.bcva)) < 1e-9
    assert abs(float(single.fva) - float(shard.fva)) < 1e-10

# ---------------------------------------------------------------------------
# G2++ collateral (CSA) twin
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_g2_collateral_huge_threshold_is_uncollateralized(market):
    oc = xva.collateral_oracle_g2(CFG, G2, market, LEGS, threshold=10.0,
                                  lag=1)
    on = xva.netting_oracle_g2(CFG, G2, market, LEGS)
    assert max(abs(a - b) for a, b in zip(oc.ee, on.ee)) < 1e-12
    assert abs(oc.cva - on.cva) < 1e-14
    assert max(abs(a - b) for a, b in zip(oc.pfe, on.pfe)) < 1e-8


def test_g2_collateral_lag0_zero_threshold_kills_exposure(market):
    oc = xva.collateral_oracle_g2(CFG, G2, market, LEGS, threshold=0.0,
                                  lag=0)
    assert all(abs(e) < 1e-12 for e in oc.ee)
    assert abs(oc.cva) < 1e-12
    assert all(p < 1e-12 for p in oc.pfe)


@pytest.mark.slow
def test_g2_collateral_dominated(market):
    """(V_t - C)^+ <= V_t^+ pathwise, so the CSA profile never exceeds
    the uncollateralized netted one, per date and in aggregate."""
    oc = xva.collateral_oracle_g2(CFG, G2, market, LEGS, threshold=0.01,
                                  lag=1)
    on = xva.netting_oracle_g2(CFG, G2, market, LEGS)
    for j in range(len(on.dates)):
        assert oc.ee[j] <= on.ee[j] + 1e-10
        assert oc.pfe[j] <= on.pfe[j] + 1e-8
    assert oc.cva <= on.cva + 1e-12


@pytest.mark.slow
def test_g2_collateral_oracle_vs_bruteforce_tensor_grid(market):
    """The triple-quadrature lag>=1 EE (outer x_s x y_s panels x x_t,
    exact row segments in y_t) is pinned against a dense 4-d
    tensor-grid trapezoid over the tilted joint law — an independent
    integration route (no conditioning chain, no segments)."""
    H, j = 0.01, 1
    legs = tuple(xva.SwapLeg(*l) for l in LEGS)
    oc = xva.collateral_oracle_g2(CFG, G2, market, LEGS, threshold=H,
                                  lag=1)
    t, s = oc.dates[j], oc.dates[j - 1]
    lam, Ba, Bb, K = xva._g2_portfolio_terms(CFG, G2, market, legs, t,
                                             1.0, CFG.s1)
    lam_s, Ba_s, Bb_s, K_s = xva._g2_portfolio_terms(CFG, G2, market,
                                                     legs, s, 1.0,
                                                     CFG.s1)
    m4, S, _ = xva._g2_csa_cov(G2, s, t)
    L = np.linalg.cholesky(S)
    Ts = np.linspace(0.0, CFG.t_final, CFG.n_mat)
    Pt = float(np.interp(t, Ts, np.asarray(market.P, np.float64)))
    n = 41
    z = np.linspace(-6.0, 6.0, n)
    w = np.full(n, z[1] - z[0])
    w[0] = w[-1] = 0.5 * (z[1] - z[0])
    w = w * np.exp(-0.5 * z * z) / math.sqrt(2.0 * math.pi)
    Z = np.stack(np.meshgrid(z, z, z, z, indexing="ij"),
                 axis=-1).reshape(-1, 4)
    w2 = (w[:, None] * w[None, :]).reshape(-1)
    W = (w2[:, None] * w2[None, :]).reshape(-1)
    X = m4[None, :] + Z @ L.T
    Vs = np.exp(-X[:, 0:1] * Ba_s[None, :]
                - X[:, 1:2] * Bb_s[None, :]) @ lam_s - K_s
    Vt = np.exp(-X[:, 2:3] * Ba[None, :]
                - X[:, 3:4] * Bb[None, :]) @ lam - K
    brute = Pt * float(W @ np.maximum(Vt - np.maximum(Vs - H, 0.0), 0.0))
    assert abs(brute - oc.ee[j]) < 3e-6     # measured h^2 floor of the
    # 41-node grid through the two relu kinks (n=41 vs 49 move < 1e-6)


@pytest.mark.parametrize("lag", [0, 1])
def test_g2_collateral_mc_matches_oracle(market, lag):
    oc = xva.collateral_oracle_g2(CFG, G2, market, LEGS, lag=lag)
    r = xva.price_collateral_g2(CFG, G2, KEY, market, LEGS, lag=lag,
                                n_blocks=4)
    ee = np.asarray(r.profile.ee)
    se = np.asarray(r.profile.ee_std_error)
    for j in range(len(oc.dates)):
        assert abs(ee[j] - oc.ee[j]) < 5.0 * se[j] + 1e-7
    assert abs(float(r.cva) - oc.cva) < 5.0 * float(r.std_error) + 1e-9
    if lag == 1:
        n = r.profile.n_paths
        tol = 5.0 * math.sqrt(0.05 * 0.95 / n) + 2e-3
        exceed = np.asarray(r.profile.exceed)[lag:]
        assert np.all(np.abs(exceed - 0.05) < tol)


def test_g2_collateral_sharded_matches_single(market):
    from hullwhite_tpu.parallel import mesh as pmesh

    kw = dict(n_paths=1 << 12, n_blocks=8)
    single = xva.price_collateral_g2(CFG, G2, KEY, market, LEGS, **kw)
    shard = xva.price_collateral_g2(CFG, G2, KEY, market, LEGS,
                                    mesh=pmesh.path_mesh(), **kw)
    assert abs(float(single.cva) - float(shard.cva)) < 1e-9
    assert np.allclose(np.asarray(single.profile.ee),
                       np.asarray(shard.profile.ee), atol=1e-7)

# ---------------------------------------------------------------------------
# Wrong-way risk: lambda_t = lambda0 + gamma r_t (HW + G2++ twins)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_wwr_gamma0_reduces_to_netting(market):
    """gamma = 0 must give pd_j x EE_j per date and the netting CVA
    exactly (the two tilts collapse to e^{-lambda0 s/t} x the e^{-I}
    tilt), both model families."""
    o0 = xva.wwr_oracle(CFG, market, LEGS, lambda0=0.02, gamma=0.0)
    on = xva.netting_oracle(CFG, market, LEGS, hazard=0.02)
    pd, _ = xva._pd_weights(on.dates, 0.02)
    assert abs(o0.cva - on.cva) < 1e-16
    assert max(abs(c - p * e)
               for c, p, e in zip(o0.contrib, pd, on.ee)) < 1e-16
    g0 = xva.wwr_oracle_g2(CFG, G2, market, LEGS, lambda0=0.02,
                           gamma=0.0)
    gn = xva.netting_oracle_g2(CFG, G2, market, LEGS, hazard=0.02)
    assert abs(g0.cva - gn.cva) < 1e-15
    assert max(abs(c - p * e)
               for c, p, e in zip(g0.contrib, pd, gn.ee)) < 1e-16


@pytest.mark.slow
def test_wwr_sign(market):
    """gamma > 0 (default likely when rates high) is WRONG-way for a
    payer (exposure high when rates high) and RIGHT-way for a receiver,
    in both model families."""
    pw = xva.wwr_oracle(CFG, market, ((0.02, 4.0, True),), gamma=0.5)
    rw = xva.wwr_oracle(CFG, market, ((0.02, 4.0, False),), gamma=0.5)
    assert pw.wwr_ratio > 1.2
    assert rw.wwr_ratio < 0.8
    pw2 = xva.wwr_oracle_g2(CFG, G2, market, ((0.02, 4.0, True),),
                            gamma=0.5)
    rw2 = xva.wwr_oracle_g2(CFG, G2, market, ((0.02, 4.0, False),),
                            gamma=0.5)
    # the G2++ defaults carry less integrated-rate variance, so the
    # effect is smaller but the signs must match
    assert pw2.wwr_ratio > 1.05
    assert rw2.wwr_ratio < 0.95


def test_wwr_oracle_vs_bruteforce_trapezoid(market):
    """One bucket term pinned against a dense 3-d Gaussian tensor-grid
    trapezoid over (r_t, I_s, I_t) — an independent route with no
    tilting and no segment decomposition."""
    legs1 = (xva.SwapLeg(0.02, 4.0, True),)
    lam0, gm, j = 0.02, 0.5, 2
    o = xva.wwr_oracle(CFG, market, legs1, lambda0=lam0, gamma=gm)
    dates = o.dates
    t, s = dates[j], dates[j - 1]
    lams, Bs, K = xva._portfolio_terms(CFG, market, legs1, t, CFG.sigma,
                                       1.0, CFG.s1)
    tables = hw.step_tables(CFG, CFG.sigma, CFG.sigma, jnp.float32)
    sig2 = float(tables.sig_st) ** 2
    uu, ww, uw = xva._date_stats(CFG, dates)[j]
    wws, cII, crIs = xva._wwr_pair_stats(CFG, s, t)
    C = sig2 * np.array([[uu, crIs, uw], [crIs, wws, cII],
                         [uw, cII, ww]])
    L = np.linalg.cholesky(C)
    rA, rB, iA, iB = xva._det_rI(CFG, dates)
    n = 81
    z = np.linspace(-7.0, 7.0, n)
    w = np.full(n, z[1] - z[0])
    w[0] = w[-1] = 0.5 * (z[1] - z[0])
    w *= np.exp(-0.5 * z * z) / math.sqrt(2.0 * math.pi)
    Z = np.stack(np.meshgrid(z, z, z, indexing="ij"), -1).reshape(-1, 3)
    W = (w[:, None, None] * w[None, :, None]
         * w[None, None, :]).ravel()
    X = Z @ L.T
    r = rA[j] + X[:, 0]
    Is = iA[j - 1] + X[:, 1]
    It = iA[j] + X[:, 2]
    V = np.exp(-np.outer(r, Bs)) @ lams - K
    Sp = np.exp(-lam0 * s - gm * Is)
    St = np.exp(-lam0 * t - gm * It)
    brute = float(W @ ((Sp - St) * np.exp(-It) * np.maximum(V, 0.0)))
    assert abs(brute - o.contrib[j]) < 1e-6   # 81-node trapezoid floor
    bcv = float(W @ ((Sp - St) * np.exp(-It) * V))
    assert abs(bcv - o.cv_mean[j]) < 1e-11    # smooth: near machine


def test_wwr_mc_matches_oracle(market):
    o = xva.wwr_oracle(CFG, market, LEGS, gamma=0.5)
    r = xva.price_wwr(CFG, KEY, market, LEGS, gamma=0.5, n_blocks=4)
    assert abs(float(r.cva) - o.cva) < 5.0 * float(r.std_error) + 1e-9
    assert abs(float(r.gamma_delta) - o.gamma_delta) \
        < 5.0 * float(r.gamma_delta_se) + 1e-8
    assert abs(float(r.lambda0_delta) - o.lambda0_delta) \
        < 5.0 * float(r.lambda0_delta_se) + 1e-8
    ee = np.asarray(r.profile.ee)
    se = np.asarray(r.profile.ee_std_error)
    for j in range(len(o.dates)):
        assert abs(ee[j] - o.contrib[j]) < 5.0 * se[j] + 1e-8
    assert float(r.std_error) < float(r.raw_std_error)


@pytest.mark.slow
def test_g2_wwr_mc_matches_oracle(market):
    o = xva.wwr_oracle_g2(CFG, G2, market, LEGS, gamma=0.5)
    r = xva.price_wwr_g2(CFG, G2, KEY, market, LEGS, gamma=0.5,
                         n_blocks=4)
    assert abs(float(r.cva) - o.cva) < 5.0 * float(r.std_error) + 1e-9
    assert abs(float(r.gamma_delta) - o.gamma_delta) \
        < 5.0 * float(r.gamma_delta_se) + 1e-8
    assert abs(float(r.lambda0_delta) - o.lambda0_delta) \
        < 5.0 * float(r.lambda0_delta_se) + 1e-8
    ee = np.asarray(r.profile.ee)
    se = np.asarray(r.profile.ee_std_error)
    for j in range(len(o.dates)):
        assert abs(ee[j] - o.contrib[j]) < 5.0 * se[j] + 1e-8


@pytest.mark.slow
def test_wwr_sharded_matches_single(market):
    from hullwhite_tpu.parallel import mesh as pmesh

    kw = dict(n_paths=1 << 12, n_blocks=8, gamma=0.5)
    s1 = xva.price_wwr(CFG, KEY, market, LEGS, **kw)
    s8 = xva.price_wwr(CFG, KEY, market, LEGS, mesh=pmesh.path_mesh(),
                       **kw)
    assert abs(float(s1.cva) - float(s8.cva)) < 1e-9
    assert abs(float(s1.gamma_delta) - float(s8.gamma_delta)) < 1e-8
    g1 = xva.price_wwr_g2(CFG, G2, KEY, market, LEGS, **kw)
    g8 = xva.price_wwr_g2(CFG, G2, KEY, market, LEGS,
                          mesh=pmesh.path_mesh(), **kw)
    assert abs(float(g1.cva) - float(g8.cva)) < 1e-9

# ---------------------------------------------------------------------------
# MVA: delta-normal dynamic initial margin (HW + G2++ twins)
# ---------------------------------------------------------------------------

# short payers + long receiver: the gradient W changes sign inside the
# sampled bulk, so |W| has a real kink (SE > 0, the CV is not exact)
MVA_LEGS = ((0.02, 2.0, True), (0.02, 2.0, True), (0.0, 4.0, False))


def test_mva_one_leg_cv_is_exact(market):
    """A one-leg receiver has W > 0 everywhere, so |W| == W, the CV is
    the estimator itself and the MC reproduces the closed form to fp32
    roundoff with ~zero SE."""
    o = xva.mva_oracle(CFG, market, ((0.02, 4.0, False),))
    r = xva.price_mva(CFG, KEY, market, ((0.02, 4.0, False),),
                      n_paths=1 << 12, n_blocks=2)
    assert abs(float(r.mva) - o.mva) < 1e-9
    assert float(r.std_error) < 1e-9


def test_mva_oracle_vs_bruteforce_trapezoid(market):
    """E[D IM] at one date pinned against a dense 2-d Gaussian
    tensor-grid trapezoid over (r, I) — independent route, no tilt."""
    legsT = tuple(xva.SwapLeg(*l) for l in MVA_LEGS)
    o = xva.mva_oracle(CFG, market, MVA_LEGS)
    j = 1
    lams, Bs, _ = xva._portfolio_terms(CFG, market, legsT, o.dates[j],
                                       CFG.sigma, 1.0, CFG.s1)
    lamW = lams * Bs
    tables = hw.step_tables(CFG, CFG.sigma, CFG.sigma, jnp.float32)
    sig2 = float(tables.sig_st) ** 2
    uu, ww, uw = xva._date_stats(CFG, o.dates)[j]
    C = sig2 * np.array([[uu, uw], [uw, ww]])
    L = np.linalg.cholesky(C)
    rA, _, iA, _ = xva._det_rI(CFG, o.dates)
    n = 401
    z = np.linspace(-8, 8, n)
    w = np.full(n, z[1] - z[0])
    w[0] = w[-1] = 0.5 * (z[1] - z[0])
    w *= np.exp(-0.5 * z * z) / math.sqrt(2 * math.pi)
    Z = np.stack(np.meshgrid(z, z, indexing="ij"), -1).reshape(-1, 2)
    W2 = (w[:, None] * w[None, :]).ravel()
    X = Z @ L.T
    rr = rA[j] + X[:, 0]
    It = iA[j] + X[:, 1]
    Wv = np.exp(-np.outer(rr, Bs)) @ lamW
    zq = xva._NDTRI(0.99)
    brute = float(W2 @ (np.exp(-It) * zq * o.s_cond[j] * np.abs(Wv)))
    assert abs(brute - o.im[j]) < 1e-10


def test_mva_mc_matches_oracle(market):
    o = xva.mva_oracle(CFG, market, MVA_LEGS)
    r = xva.price_mva(CFG, KEY, market, MVA_LEGS, n_blocks=4)
    assert float(r.std_error) > 0.0          # the kink is exercised
    assert abs(float(r.mva) - o.mva) < 5.0 * float(r.std_error) + 1e-10
    im = np.asarray(r.im)
    se = np.asarray(r.im_std_error)
    for j in range(len(o.dates)):
        assert abs(im[j] - o.im[j]) < 5.0 * se[j] + 1e-9
    assert float(r.std_error) < float(r.raw_std_error)


def test_mva_scalings(market):
    """MVA is linear in spread_im and in z_q (IM = z_q s |W|), and the
    funding weights decay with both hazards."""
    o = xva.mva_oracle(CFG, market, MVA_LEGS, spread_im=0.005)
    o2 = xva.mva_oracle(CFG, market, MVA_LEGS, spread_im=0.010)
    assert abs(o2.mva - 2.0 * o.mva) < 1e-18
    oq = xva.mva_oracle(CFG, market, MVA_LEGS, quantile_im=0.975)
    ratio = xva._NDTRI(0.975) / xva._NDTRI(0.99)
    assert abs(oq.mva - ratio * o.mva) < 1e-15
    oh = xva.mva_oracle(CFG, market, MVA_LEGS, hazard=0.05)
    assert oh.mva < o.mva


def test_g2_mva_oracle_vs_bruteforce(market):
    """E[D IM] at one date pinned against a dense 3-d Gaussian
    tensor-grid trapezoid over (x, y, I)."""
    from hullwhite_tpu.models.g2pp import _g2_functional_cov, _v_integral

    legsT = tuple(xva.SwapLeg(*l) for l in MVA_LEGS)
    o = xva.mva_oracle_g2(CFG, G2, market, MVA_LEGS)
    j, t = 1, o.dates[1]
    lam, Ba, Bb, _ = xva._g2_portfolio_terms(CFG, G2, market, legsT, t,
                                             1.0, CFG.s1)
    C3 = _g2_functional_cov(G2, (("u", t, 1., 0.), ("u", t, 0., 1.),
                                 ("I", t)))
    L3 = np.linalg.cholesky(C3)
    Sxx, Sxy, Syy = xva._g2_cond_cov(G2, t, o.delta)
    n = 81
    z = np.linspace(-7, 7, n)
    w = np.full(n, z[1] - z[0])
    w[0] = w[-1] = 0.5 * (z[1] - z[0])
    w *= np.exp(-0.5 * z * z) / math.sqrt(2 * math.pi)
    Z = np.stack(np.meshgrid(z, z, z, indexing="ij"), -1).reshape(-1, 3)
    W3 = (w[:, None, None] * w[None, :, None]
          * w[None, None, :]).ravel()
    X3 = Z @ L3.T
    Ts = np.linspace(0, CFG.t_final, CFG.n_mat)
    Pt = float(np.interp(t, Ts, np.asarray(market.P, np.float64)))
    Et = lam[None, :] * np.exp(-np.outer(X3[:, 0], Ba)
                               - np.outer(X3[:, 1], Bb))
    gx = np.sum(Et * Ba[None, :], axis=1)
    gy = np.sum(Et * Bb[None, :], axis=1)
    Q = Sxx * gx * gx + 2 * Sxy * gx * gy + Syy * gy * gy
    D = Pt * math.exp(-0.5 * _v_integral(G2, t)) * np.exp(-X3[:, 2])
    zq = xva._NDTRI(0.99)
    brute = float(W3 @ (D * zq * np.sqrt(Q)))
    assert abs(brute - o.im[j]) < 1e-9


def test_g2_mva_mc_matches_oracle(market):
    o = xva.mva_oracle_g2(CFG, G2, market, MVA_LEGS)
    r = xva.price_mva_g2(CFG, G2, KEY, market, MVA_LEGS, n_blocks=4)
    assert abs(float(r.mva) - o.mva) < 5.0 * float(r.std_error) + 1e-10
    im = np.asarray(r.im)
    se = np.asarray(r.im_std_error)
    for j in range(len(o.dates)):
        assert abs(im[j] - o.im[j]) < 5.0 * se[j] + 1e-9


@pytest.mark.slow
def test_mva_sharded_matches_single(market):
    from hullwhite_tpu.parallel import mesh as pmesh

    kw = dict(n_paths=1 << 12, n_blocks=8)
    s1 = xva.price_mva(CFG, KEY, market, MVA_LEGS, **kw)
    s8 = xva.price_mva(CFG, KEY, market, MVA_LEGS,
                       mesh=pmesh.path_mesh(), **kw)
    assert abs(float(s1.mva) - float(s8.mva)) < 1e-12
    g1 = xva.price_mva_g2(CFG, G2, KEY, market, MVA_LEGS, **kw)
    g8 = xva.price_mva_g2(CFG, G2, KEY, market, MVA_LEGS,
                          mesh=pmesh.path_mesh(), **kw)
    assert abs(float(g1.mva) - float(g8.mva)) < 1e-12


# ---------------------------------------------------------------------------
# KVA
# ---------------------------------------------------------------------------


def test_kva_oracle_is_weighted_ee(market):
    """KVA = sum w_j EE_j with w the survival-discounted capital-cost
    weights — pinned against the netting oracle's own EE profile, and
    the linearity/decay scalings of the weight formula."""
    o = xva.kva_oracle(CFG, market, LEGS)
    on = xva.netting_oracle(CFG, market, LEGS)
    w = xva._kva_weights(on.dates, 1.0, 0.10, 0.08, 0.02, 0.01)
    assert abs(o.kva - sum(a * b for a, b in zip(w, on.ee))) < 1e-18
    assert max(abs(c - 0.08 * e)
               for c, e in zip(o.capital, on.ee)) < 1e-18
    o2 = xva.kva_oracle(CFG, market, LEGS, cost_of_capital=0.20)
    assert abs(o2.kva - 2.0 * o.kva) < 1e-18
    ok = xva.kva_oracle(CFG, market, LEGS, capital_ratio=0.16)
    assert abs(ok.kva - 2.0 * o.kva) < 1e-18
    oh = xva.kva_oracle(CFG, market, LEGS, hazard=0.10)
    assert oh.kva < o.kva


def test_kva_mc_matches_oracle(market):
    o = xva.kva_oracle(CFG, market, LEGS)
    r = xva.price_kva(CFG, KEY, market, LEGS, n_blocks=4)
    assert abs(float(r.kva) - o.kva) < 5.0 * float(r.std_error) + 1e-10
    assert float(r.std_error) < float(r.raw_std_error)   # CV helps
    cap = np.asarray(r.capital)
    se = np.asarray(r.capital_std_error)
    for j in range(len(o.dates)):
        assert abs(cap[j] - o.capital[j]) < 5.0 * se[j] + 1e-8


def test_g2_kva_mc_matches_oracle(market):
    o = xva.kva_oracle_g2(CFG, G2, market, LEGS)
    r = xva.price_kva_g2(CFG, G2, KEY, market, LEGS, n_blocks=4)
    assert abs(float(r.kva) - o.kva) < 5.0 * float(r.std_error) + 1e-10
    assert float(r.std_error) < float(r.raw_std_error)
    cap = np.asarray(r.capital)
    se = np.asarray(r.capital_std_error)
    for j in range(len(o.dates)):
        assert abs(cap[j] - o.capital[j]) < 5.0 * se[j] + 1e-8


@pytest.mark.slow
def test_kva_sharded_matches_single(market):
    from hullwhite_tpu.parallel import mesh as pmesh

    kw = dict(n_paths=1 << 12, n_blocks=8)
    s1 = xva.price_kva(CFG, KEY, market, LEGS, **kw)
    s8 = xva.price_kva(CFG, KEY, market, LEGS,
                       mesh=pmesh.path_mesh(), **kw)
    assert abs(float(s1.kva) - float(s8.kva)) < 1e-12
    g1 = xva.price_kva_g2(CFG, G2, KEY, market, LEGS, **kw)
    g8 = xva.price_kva_g2(CFG, G2, KEY, market, LEGS,
                          mesh=pmesh.path_mesh(), **kw)
    assert abs(float(g1.kva) - float(g8.kva)) < 1e-12


# ---------------------------------------------------------------------------
# Bermudan swaption exposure (American Monte Carlo XVA)
# ---------------------------------------------------------------------------

BERM_EX = (5.0, 6.0, 7.0, 8.0)


@pytest.fixture(scope="module")
def berm_sched():
    from hullwhite_tpu.instruments import swap_fixed_leg

    return swap_fixed_leg(CFG, 0.025, 4.0)


def test_bermudan_exposure_optional_stopping(market, berm_sched):
    """The stopped discounted value has the same mean at EVERY date
    (optional stopping under the DP policy): y_means_j == the DP price
    to forward-quadrature error, and sum flows == price (every path
    exercises or expires)."""
    o = xva.bermudan_exposure_oracle(CFG, market, berm_sched, BERM_EX)
    for y in o.y_means:
        assert abs(y - o.price) < 5e-6
    assert abs(sum(o.flows) - o.price) < 5e-6
    assert o.ee[0] == o.y_means[0]          # nothing stopped before e_0
    # exposure decays as optionality burns off
    assert o.ee[-1] < o.ee[0]


def test_bermudan_exposure_one_date_is_european(market, berm_sched):
    """k=1 collapses to the European swaption: EE_0 = the option price
    (forward trapezoid vs backward exact-segment roll differ by the
    O(h^2) grid error ~3e-7), and the DP price equals the single-date
    oracle exactly (same backward code path)."""
    o = xva.bermudan_exposure_oracle(CFG, market, berm_sched, (5.0,))
    assert abs(o.ee[0] - o.price) < 5e-6
    from hullwhite_tpu.bermudan import dp_oracle

    assert abs(o.price - dp_oracle(CFG, market, berm_sched, (5.0,))) \
        < 1e-12


def test_bermudan_exposure_mc_matches_oracle(market, berm_sched):
    r, o = xva.price_bermudan_xva(CFG, KEY, market, berm_sched, BERM_EX,
                                  n_blocks=4)
    ee = np.asarray(r.profile.ee)
    se = np.asarray(r.profile.ee_std_error)
    assert se[0] < 1e-12                 # Y_0 == X_0: the CV is exact
    assert abs(ee[0] - o.ee[0]) < 1e-6
    for j in range(1, len(BERM_EX)):
        assert abs(ee[j] - o.ee[j]) < 5.0 * se[j] + 1e-7
    assert abs(float(r.cva) - o.cva) < 5.0 * float(r.std_error) + 1e-9
    assert float(r.std_error) < float(r.raw_std_error)
    n = r.profile.n_paths
    tol = 5.0 * math.sqrt(0.05 * 0.95 / n) + 2e-3
    assert np.all(np.abs(np.asarray(r.profile.exceed) - 0.05) < tol)


def test_bermudan_exposure_payer_twin(market, berm_sched):
    """Payer policy exercises at HIGH r; the profile still satisfies
    the stopping identity and the MC still matches."""
    o = xva.bermudan_exposure_oracle(CFG, market, berm_sched, BERM_EX,
                                     payer=True)
    for y in o.y_means:
        assert abs(y - o.price) < 5e-6
    r, _ = xva.price_bermudan_xva(CFG, KEY, market, berm_sched, BERM_EX,
                                  payer=True, n_blocks=4)
    assert abs(float(r.cva) - o.cva) < 5.0 * float(r.std_error) + 1e-9


@pytest.mark.slow
def test_bermudan_exposure_sharded_matches_single(market, berm_sched):
    from hullwhite_tpu.parallel import mesh as pmesh

    kw = dict(n_paths=1 << 12, n_blocks=8)
    s1, _ = xva.price_bermudan_xva(CFG, KEY, market, berm_sched,
                                   BERM_EX, **kw)
    s8, _ = xva.price_bermudan_xva(CFG, KEY, market, berm_sched,
                                   BERM_EX, mesh=pmesh.path_mesh(), **kw)
    assert abs(float(s1.cva) - float(s8.cva)) < 1e-9


def test_g2_bermudan_exposure_mc_matches_oracle(market, berm_sched):
    """G2++ twin: optional-stopping identity at the 2-d quadrature
    error, MC vs oracle within 5 SE + the measured O(h^2) bilinear-grid
    gap (CVA MC-oracle diff 2.3e-6 at n_grid=81, 1.1e-6 at 121, 0.7e-6
    at 161 — same convexity-bias family as the G2 notes DP,
    tests/test_g2_note.py)."""
    ex = (5.0, 6.0, 7.0)
    r, o = xva.price_bermudan_xva_g2(CFG, G2, KEY, market, berm_sched,
                                     ex, n_blocks=4, n_grid=81)
    for y in o.y_means:
        assert abs(y - o.price) < 1e-3
    assert abs(sum(o.flows) - o.price) < 1e-3
    ee = np.asarray(r.profile.ee)
    se = np.asarray(r.profile.ee_std_error)
    assert se[0] < 1e-12
    for j in range(len(ex)):
        assert abs(ee[j] - o.ee[j]) < 5.0 * se[j] + 2e-6
    assert abs(float(r.cva) - o.cva) < 5.0 * float(r.std_error) + 3e-6
    assert float(r.std_error) < float(r.raw_std_error)
    n = r.profile.n_paths
    tol = 5.0 * math.sqrt(0.05 * 0.95 / n) + 3e-3
    assert np.all(np.abs(np.asarray(r.profile.exceed) - 0.05) < tol)


def test_g2_bermudan_exposure_sharded_matches_single(market, berm_sched):
    from hullwhite_tpu.parallel import mesh as pmesh

    ex = (5.0, 6.0)
    kw = dict(n_paths=1 << 12, n_blocks=8, n_grid=61)
    s1, _ = xva.price_bermudan_xva_g2(CFG, G2, KEY, market, berm_sched,
                                      ex, **kw)
    s8, _ = xva.price_bermudan_xva_g2(CFG, G2, KEY, market, berm_sched,
                                      ex, mesh=pmesh.path_mesh(), **kw)
    assert abs(float(s1.cva) - float(s8.cva)) < 1e-9


@pytest.mark.slow
def test_netting_vega_three_ways(market):
    """Netted-book dCVA/dsigma: jvp == CRN-FD on the same kernel, both
    on the fp64 oracle FD within MC noise."""
    v = xva.vega_cva_netting(CFG, KEY, market, LEGS, n_blocks=2)
    assert abs(float(v.vega) - float(v.fd_vega)) \
        < 1e-3 * abs(v.oracle_vega) + 1e-7
    assert abs(float(v.vega) - v.oracle_vega) < 0.02 * abs(v.oracle_vega)
