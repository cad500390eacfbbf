"""Time-loop semantics: staged dt schedule, controller coupling, theta flow."""

import jax.numpy as jnp
import numpy as np
import pytest

from gmpnp_tpu.models import edl_1d


def test_staged_dt_schedule_values():
    """Non-dry-run schedule reproduces the reference staging
    (1D/MPNP_CO2ER_EDL.py:270-290): 10,000 steps of 1e-5 s then 10,000 of
    1e-3 s, switched by step index as a traced scalar."""
    cfg = edl_1d.EDL1DConfig(L_n=1.0e-6, dry_run=False)
    prog = edl_1d.build(cfg)
    sch = prog.schedule
    assert sch["n1"] == 10_000
    assert sch["n2"] == 10_000
    assert prog.tot_num_steps == 20_000
    np.testing.assert_allclose(
        sch["dt1"] * prog.time_constant, 1.0e-5, rtol=1e-12)
    np.testing.assert_allclose(
        sch["dt2"] * prog.time_constant, 1.0e-3, rtol=1e-12)

    u = jnp.ones((prog.space.num_vertices, 7))
    chf = jnp.asarray(0.0)
    th_early = prog._theta_of_carry((u, chf), jnp.asarray(0))
    th_late = prog._theta_of_carry((u, chf), jnp.asarray(sch["n1"]))
    assert float(th_early["dt"]) == pytest.approx(sch["dt1"])
    assert float(th_late["dt"]) == pytest.approx(sch["dt2"])


def test_dry_run_schedule():
    cfg = edl_1d.EDL1DConfig(L_n=1.0e-6, dry_run=True)
    prog = edl_1d.build(cfg)
    assert prog.tot_num_steps == 100   # ref :256-268
    np.testing.assert_allclose(
        prog.schedule["dt1"] * prog.time_constant, 1.0e-5, rtol=1e-12)


def test_controller_feeds_fluxes():
    """current_H_frac reshapes J_OH/J_H per the reference update (:789-793)."""
    cfg = edl_1d.EDL1DConfig(L_n=1.0e-6, H_OHP=1.1, dry_run=True)
    prog = edl_1d.build(cfg)
    u = jnp.ones((prog.space.num_vertices, 7))
    th0 = prog._theta_of_carry((u, jnp.asarray(0.0)), 0)
    th5 = prog._theta_of_carry((u, jnp.asarray(0.5)), 0)
    current = cfg.current_OHP_ss
    assert float(th0["J_H"]) == pytest.approx(0.0)
    assert float(th0["J_OH"]) == pytest.approx(
        -prog.J_pref["OH"] * current)
    assert float(th5["J_H"]) == pytest.approx(
        prog.J_pref["H"] * current * 0.5)
    assert float(th5["J_OH"]) == pytest.approx(
        -prog.J_pref["OH"] * current * 0.5)


def test_record_stride_matches_full_history():
    """record_stride=k keeps exactly every k-th state and the same final
    carry as the unstrided run (bounded-history item, SURVEY §5)."""
    import jax.numpy as jnp
    import numpy as np

    from gmpnp_tpu.solve.timeloop import StepStats, run_transient

    def step(u, theta):
        stats = StepStats(jnp.array(1, jnp.int32), jnp.asarray(True),
                          jnp.asarray(0.0), jnp.array(0, jnp.int32))
        return u * 1.5 + 1.0, stats

    u0 = jnp.ones((3,))
    (uf_full, _), (hist_full, _) = run_transient(step, (u0, None), 6)
    (uf_k, _), (hist_k, _) = run_transient(step, (u0, None), 6,
                                           record_stride=3)
    np.testing.assert_allclose(np.asarray(uf_k), np.asarray(uf_full))
    assert hist_k.shape[0] == 2
    np.testing.assert_allclose(np.asarray(hist_k),
                               np.asarray(hist_full)[[2, 5]])

    import pytest
    with pytest.raises(ValueError):
        run_transient(step, (u0, None), 7, record_stride=3)
