"""Cross-checks of the C++ host-runtime library against the NumPy fallback.

Skipped when native/libhwnative.so has not been built (`make -C native`).
"""

import numpy as np
import pytest

from hullwhite_tpu import tiny_config
from hullwhite_tpu.utils import native
from hullwhite_tpu.ops import engine_exact, engine_linear
from hullwhite_tpu.models import hull_white as hw

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")

CFG = tiny_config()


def _np_drift():
    # numpy fallback path, bypassing the native branch
    import math
    a, dt, spec = CFG.a, CFG.dt, CFG.theta
    E = math.exp(-a * dt)
    one_m = (1.0 - E) / a
    i = np.arange(CFG.n_steps, dtype=np.float64)
    s, t = i * dt, (i + 1.0) * dt
    lin = (t - E * s) / a - one_m / a
    base = np.where(s < spec.t_break,
                    spec.beta0 * lin + spec.alpha0 * one_m,
                    spec.beta1 * lin + spec.alpha1 * one_m)
    psi = (1.0 + np.exp(-2.0 * a * t) - E - np.exp(-a * (t + s))) / (a * a)
    return base, psi


def test_drift_tables_match():
    base_c, psi_c = native.drift_tables(CFG.a, CFG.dt, CFG.n_steps, CFG.theta)
    base_np, psi_np = _np_drift()
    np.testing.assert_allclose(base_c, base_np, rtol=1e-14)
    np.testing.assert_allclose(psi_c, psi_np, rtol=1e-14)


def test_shock_shapes_match():
    n1 = CFG.n_steps_s1
    u_c, w_c = native.shock_shapes(CFG.a, CFG.dt, n1)
    u_py, w_py = engine_linear._shock_shapes(CFG, n1)
    np.testing.assert_allclose(u_c.astype(np.float32), u_py, rtol=1e-6)
    np.testing.assert_allclose(w_c.astype(np.float32), w_py, rtol=1e-6)


def test_curve_chol_matches_numpy():
    LT_c = native.curve_chol(CFG.a, CFG.dt, CFG.n_steps, CFG.n_mat,
                             CFG.save_stride)
    LT_py = engine_exact.curve_chol(CFG)
    np.testing.assert_allclose(LT_c.astype(np.float32), LT_py,
                               rtol=1e-5, atol=1e-9)


def test_zbc_chol_matches():
    c = native.zbc_chol(CFG.a, CFG.dt, CFG.n_steps_s1)
    py = engine_exact.zbc_chol(CFG)
    np.testing.assert_allclose(c, py, rtol=1e-6)  # python path sums fp32 shapes


def test_summarize_matches(tmp_path):
    from hullwhite_tpu.utils import stats

    x = np.random.default_rng(0).normal(1.0, 0.1, 20)
    out = native.summarize(x)
    s = stats.summarize(x)
    assert abs(out[0] - s.mean) < 1e-12
    assert abs(out[1] - s.std) < 1e-12
    assert abs(out[2] - s.std_error) < 1e-12
    np.testing.assert_allclose(out[3:8], s.quartiles, rtol=1e-12)


def test_save_bin_roundtrip(tmp_path):
    from hullwhite_tpu.utils import io as hwio

    arr = np.arange(32, dtype=np.float32) * 0.5
    p = tmp_path / "x.bin"
    native.save_bin(str(p), arr)
    back = hwio.load_bin(p, 32)
    np.testing.assert_array_equal(arr, back)


def test_dp_continuation_matches_numpy():
    """C++ hw_dp_continuation vs the NumPy piecewise-linear-exact form."""
    if not native.available():
        pytest.skip("native library not built")
    from scipy.stats import norm

    rng = np.random.default_rng(3)
    grid_t = np.linspace(-0.3, 0.5, 401)
    V = np.maximum(0.9 - np.exp(-grid_t), 0.0) + 0.05 * grid_t ** 2
    grid_s = np.linspace(-0.2, 0.4, 97)
    args = dict(rdet_s=0.05, rdet_t=0.06, didet=0.12, bt=0.8, bI=0.04,
                vt=0.004, vI=0.03, ctI=0.0008)
    got = native.dp_continuation(grid_s, grid_t, V, **args)

    # NumPy reference (same math as bermudan.dp_oracle's fallback)
    m_t = args["rdet_t"] + args["bt"] * (grid_s - args["rdet_s"])
    mI = args["didet"] + args["bI"] * (grid_s - args["rdet_s"])
    s = np.sqrt(args["vt"])
    m = (m_t - args["ctI"])[:, None]
    t = (grid_t[None, :] - m) / s
    Phi, phi = norm.cdf(t), norm.pdf(t)
    b = np.diff(V) / np.diff(grid_t)
    a = V[:-1] - b * grid_t[:-1]
    mid = np.sum((a[None, :] + b[None, :] * m) * (Phi[:, 1:] - Phi[:, :-1])
                 - b[None, :] * s * (phi[:, 1:] - phi[:, :-1]), axis=1)
    want = (np.exp(-mI + 0.5 * args["vI"])
            * (mid + V[0] * Phi[:, 0] + V[-1] * (1 - Phi[:, -1])))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)


def test_dp_continuation_cubic_matches_kernel_avg():
    """C++ hw_dp_continuation3 vs the shared Python cubic cell kernel
    (range_note._kernel_avg order="cubic") — the two implementations of
    the round-4 Hermite correction must agree to fp64 roundoff."""
    if not (native.available() and native.has_dp_cubic()):
        pytest.skip("native library without the cubic sweep")
    from hullwhite_tpu.range_note import _kernel_avg

    grid_t = np.linspace(-0.3, 0.5, 401)
    V = np.maximum(0.9 - np.exp(-grid_t), 0.0) + 0.05 * grid_t ** 2
    grid_s = np.linspace(-0.2, 0.4, 97)
    args = dict(rdet_s=0.05, rdet_t=0.06, didet=0.12, bt=0.8, bI=0.04,
                vt=0.004, vI=0.03, ctI=0.0008)
    got = native.dp_continuation(grid_s, grid_t, V, order="cubic",
                                 **args)
    m_t = args["rdet_t"] + args["bt"] * (grid_s - args["rdet_s"])
    mI = args["didet"] + args["bI"] * (grid_s - args["rdet_s"])
    want = (np.exp(-mI + 0.5 * args["vI"])
            * _kernel_avg(m_t - args["ctI"], np.sqrt(args["vt"]),
                          grid_t, V, order="cubic"))
    # the two sides accumulate the cell sums in different orders
    # (running C++ scalar loop vs numpy moment matmuls): fp64 roundoff
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_stale_library_degrades_to_fallback(tmp_path, monkeypatch):
    """A .so predating a newly added symbol must make available() False
    (NumPy fallbacks) rather than raise AttributeError out of _lib()."""
    import ctypes
    import shutil
    import subprocess
    from pathlib import Path

    if shutil.which("gcc") is None:
        pytest.skip("no C compiler to build the stub library")
    src = tmp_path / "stub.c"
    src.write_text("void hw_drift_tables(void) {}\n")
    so = tmp_path / "libstub.so"
    subprocess.run(["gcc", "-shared", "-fPIC", "-o", str(so), str(src)],
                   check=True)
    monkeypatch.setattr(native, "_LIB_PATHS", [Path(so)])
    native._lib.cache_clear()
    try:
        assert native.available() is False
    finally:
        native._lib.cache_clear()


def test_dp_continuation_cubic_double_node_guard():
    """Round-5 advisor fix: a grid with an inserted ±eps double node
    carrying a value JUMP must not feed near-infinite slopes into the
    Hermite correction of neighbor cells — the C++ sweep applies the
    same break handling as range_note._kernel_avg (one-sided slopes at
    break-adjacent nodes, zero correction on the break cell), so the
    two sides still agree to the break cell's own O(eps) mass."""
    if not (native.available() and native.has_dp_cubic()):
        pytest.skip("native library without the cubic sweep")
    from hullwhite_tpu.range_note import _kernel_avg

    base = np.linspace(-0.3, 0.5, 201)
    eps = 1e-9
    kink = 0.1234
    grid_t = np.sort(np.unique(np.concatenate(
        [base, [kink - eps, kink + eps]])))
    # value jumps by 0.05 across the double node, smooth elsewhere
    V = 0.05 * grid_t ** 2 + np.where(grid_t >= kink, 0.05, 0.0)
    grid_s = np.linspace(-0.2, 0.4, 57)
    args = dict(rdet_s=0.05, rdet_t=0.06, didet=0.12, bt=0.8, bI=0.04,
                vt=0.004, vI=0.03, ctI=0.0008)
    got = native.dp_continuation(grid_s, grid_t, V, order="cubic",
                                 **args)
    assert np.all(np.isfinite(got))
    m_t = args["rdet_t"] + args["bt"] * (grid_s - args["rdet_s"])
    mI = args["didet"] + args["bI"] * (grid_s - args["rdet_s"])
    want = (np.exp(-mI + 0.5 * args["vI"])
            * _kernel_avg(m_t - args["ctI"], np.sqrt(args["vt"]),
                          grid_t, V, order="cubic"))
    # the break cell itself carries O(eps) Gaussian mass; the only
    # allowed difference is its linear-chord treatment (~1e-8)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-7)
    # and the guard actually matters: without it the correction blows
    # up by ~jump/eps — assert we are nowhere near that scale
    assert np.max(np.abs(got - want)) < 1e-3
