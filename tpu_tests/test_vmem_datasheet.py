"""Hardware bracket for the static VMEM datasheet: compile the fused ZBC
exact kernel under Mosaic vmem caps derived from the declared working set
(pallas/fused.vmem_datasheet).  Compiling under 4x the declared bytes and
being rejected under 1/8x pins the true Mosaic allocation inside
[declared/8, 4*declared] — the closest available analogue of reading the
allocation directly (the axon tunnel swallows Mosaic's error detail, so
the exact number cannot be parsed from a failing compile).
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import pytest

if jax.devices()[0].platform == "cpu":
    pytest.skip("requires TPU hardware", allow_module_level=True)

from hullwhite_tpu import HWConfig
from hullwhite_tpu.models import hull_white as hw
from hullwhite_tpu.pallas import fused

CFG = HWConfig(n_paths=1 << 16, path_block=1 << 15)
KEY = jax.random.key(3)


def _compile_zbc(limit_bytes):
    """Fresh AOT compile of the fused exact ZBC kernel under a vmem cap.
    Fresh jit objects only: the module hook is read at trace time and must
    never leak into cached production callables."""
    tables = hw.step_tables(CFG, CFG.sigma, CFG.sigma)
    Ts = jax.numpy.linspace(0.0, CFG.t_final, CFG.n_mat)
    market = hw.MarketCurve(P=jax.numpy.exp(-0.012 * Ts),
                            f=jax.numpy.full((CFG.n_mat,), 0.012))
    with fused.vmem_limit(limit_bytes):
        local = fused.zbc_local_fn(CFG, tables, market, CFG.sigma,
                                   exact=True)
        jax.jit(local, static_argnums=(2,)).lower(
            KEY, jax.numpy.int32(0), 2).compile()


def test_declared_vmem_brackets_true_allocation():
    declared = fused.vmem_datasheet(CFG)["zbc_exact"]["declared_bytes"]
    _compile_zbc(4 * declared)          # must fit
    with pytest.raises(Exception):      # noqa: B017 - tunnel wraps the
        _compile_zbc(declared // 8)     # Mosaic error opaquely
