"""Headline benchmark: 3D GMPNP pore transient at reference scale.

BASELINE.json config 5 is the 3D GMPNP pore (the reference's headline
workload: 9 fields x ~3.6k nodes x 1,000 backward-Euler steps under
MUMPS, 3D/MPNP_CO2ER_pore.py:329-365).  This benchmark runs the first
N_STEPS steps of that transient on the shipped L_50_R_5 mesh (3,679
nodes / 17,297 tets; regenerated if the reference data is not mounted)
with the framework's production configuration: damped Newton over the
z-slab block-banded mixed-precision direct solver (solve.slab — the
TPU-native MUMPS replacement).  A second config benches the 1D GMPNP
EDL flagship (BASELINE config 2, dry-run length).

Protocol (round-2: the tunneled backend now supports re-executing a
compiled program): AOT-compile, one warm-up execution, then the median
of REPS timed executions, each ending in a value fetch
(block_until_ready does not surface async faults through the tunnel,
docs/TPU_NOTES.md).  Reported per config:
  - ms per transient step
  - ms per Newton iteration (the BASELINE.md metric; normalizes away
    steps that converge in zero iterations once the transient settles)
  - vs_baseline: CPU-backend wall-clock for the same compiled program
    on this host / TPU wall-clock (the BASELINE.json axis "target >=
    10x single-CPU-core"; the XLA CPU backend is multi-threaded, so
    this undercounts the advantage vs one core).
CPU costs are measured once and cached in bench_cpu_baseline.json,
keyed by config.

Prints ONE JSON line:
    {"metric": ..., "value": <ms/step of the 3D headline config>,
     "unit": "ms/step", "vs_baseline": ..., "extra": {...}}
"""

import json
import os
import time

import numpy as np

N_STEPS = 8
REPS = 3
HERE = os.path.dirname(os.path.abspath(__file__))
_CPU_CACHE = os.path.join(HERE, "bench_cpu_baseline.json")
os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")


def _build_pore():
    import jax
    import jax.numpy as jnp

    from gmpnp_tpu.models import pore_3d
    from gmpnp_tpu.solve.timeloop import make_implicit_step

    cfg = pore_3d.Pore3DConfig(physics="GMPNP", L=50e-9, R=5e-9)
    prog = pore_3d.build(cfg)
    nf, ns = cfg.n_fields, len(cfg.species)
    step = make_implicit_step(prog.space, prog.form, cfg.newton, cfg.linear,
                              bc_of_theta=prog._bc_of_theta)

    def run(u0):
        def body(carry, i):
            u, extra = carry
            th = prog._theta_of_carry((u, extra), i)
            u_new, st = step(u, th)
            return (u_new, extra), st.newton_iters

        (u, _), iters = jax.lax.scan(
            body, (u0, jnp.asarray(0.0)), jnp.arange(N_STEPS))
        return u, iters

    u0 = jnp.ones((prog.space.num_vertices, nf)).at[:, ns].set(0.0)
    key = f"pore3d_gmpnp/L50R5/N{prog.space.num_vertices}/steps{N_STEPS}/slab/v5"
    return run, u0, key, prog.space.num_vertices


def _build_edl():
    import jax
    import jax.numpy as jnp

    from gmpnp_tpu.models import edl_1d

    cfg = edl_1d.EDL1DConfig(L_n=1.0e-6, dry_run=True)
    prog = edl_1d.build(cfg)
    from gmpnp_tpu.solve.timeloop import make_implicit_step

    step = make_implicit_step(prog.space, prog.form, cfg.newton, cfg.linear,
                              bc_of_theta=lambda theta: prog.bc)
    n = 100   # dry-run schedule length (ref 1D/MPNP_CO2ER_EDL.py:256-268)

    def run(u0):
        def body(carry, i):
            u, chf = carry
            th = prog._theta_of_carry((u, chf), i)
            u_new, st = step(u, th)
            chf = prog._update_carry(chf, u_new, i)
            return (u_new, chf), st.newton_iters

        (u, _), iters = jax.lax.scan(
            body, (u0, jnp.asarray(0.001 if cfg.H_OHP is not None else 0.0)),
            jnp.arange(n))
        return u, iters

    u0 = jnp.concatenate(
        [jnp.ones((prog.space.num_vertices, 6)),
         jnp.zeros((prog.space.num_vertices, 1))], axis=1)
    key = f"edl1d_gmpnp/1um/N{prog.space.num_vertices}/steps{n}/cr/v5"
    return run, u0, key, n


def _build_pore_sweep(lanes=4):
    """BASELINE config 5 is explicitly the pore WITH a voltage sweep
    (the reference's production pattern: one cluster job per flag value,
    README.md:37-39).  A vmapped 8-step transient over ``lanes`` wall
    voltages; while-loop Newton (a vmapped lax.cond pays max_iter full
    bodies per trip, probe_r2_g).  Runs at the (3,24) generated mesh
    (N=925): vmapped execution at the shipped N=3679 mesh kernel-faults
    the tunneled worker even at 2 lanes (probe_r2_j) — size-dependent,
    under investigation."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gmpnp_tpu.models import pore_3d
    from gmpnp_tpu.solve.timeloop import make_implicit_step

    cfg = pore_3d.Pore3DConfig(physics="GMPNP", L=100e-9, R=10e-9,
                               mesh_resolution=(3, 24))
    prog = pore_3d.build(cfg)
    nf, ns = cfg.n_fields, len(cfg.species)
    s2 = np.unique(
        prog.mesh.facets[prog.mesh.facet_markers == pore_3d.S2].reshape(-1))

    def bc_of_theta(theta):
        bc = prog.bc.set_value_masked(prog.s1_verts, prog.idx["CO2"],
                                      theta["co2_s1"])
        return bc.set_value_masked(s2, ns, theta["voltage"])

    newton = dataclasses.replace(cfg.newton, loop="while")
    step = make_implicit_step(prog.space, prog.form, newton, cfg.linear,
                              bc_of_theta=bc_of_theta)

    def run(u0, voltages):
        def single(u0_l, voltage):
            def body(carry, i):
                u, extra = carry
                th = prog._theta_of_carry((u, extra), i)
                th["voltage"] = voltage
                u_new, st = step(u, th)
                return (u_new, extra), st.newton_iters

            (u, _), iters = jax.lax.scan(
                body, (u0_l, jnp.asarray(0.0)), jnp.arange(N_STEPS))
            return u, iters

        return jax.vmap(single)(u0, voltages)

    u0 = jnp.ones((prog.space.num_vertices, nf)).at[:, ns].set(0.0)
    u0v = jnp.stack([u0] * lanes)
    volts = jnp.asarray(np.linspace(-1.0, -2.5, lanes))
    key = (f"pore3d_sweep/gen324/N{prog.space.num_vertices}"
           f"/steps{N_STEPS}x{lanes}/slab/v5")
    return run, (u0v, volts), key, prog.space.num_vertices


def _timed_run(run, args, device, reps=REPS):
    """AOT compile on device; warm-up; median of reps (exec + fetch)."""
    import jax

    if not isinstance(args, tuple):
        args = (args,)
    argsd = tuple(jax.device_put(a, device) for a in args)
    compiled = jax.jit(run).lower(*argsd).compile()
    out, iters = compiled(*argsd)
    chk = float(abs(out).sum())
    assert np.isfinite(chk), "non-finite bench result"
    n_newton = int(np.asarray(iters).sum())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out, iters = compiled(*argsd)
        chk = float(abs(out).sum())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), float(np.std(ts)), n_newton


def _cpu_seconds(run, args, key):
    """Same compiled program on the host CPU backend (cached by key)."""
    import jax

    cache = {}
    if os.path.exists(_CPU_CACHE):
        try:
            cache = json.load(open(_CPU_CACHE))
        except Exception:
            cache = {}
    if cache.get(key) is not None:
        return float(cache[key])
    cpu = jax.devices("cpu")[0]
    t, _, _ = _timed_run(run, args, cpu, reps=1)
    cache[key] = t
    with open(_CPU_CACHE, "w") as f:
        json.dump(cache, f, indent=1)
    return t


def _child(config: str) -> dict:
    """Run one bench config in this process and return its record."""
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    accel = jax.devices()[0]

    if config == "pore":
        run_p, u0_p, key_p, N = _build_pore()
        t_tpu, t_std, n_newton = _timed_run(run_p, u0_p, accel)
        rec = {
            "mesh_nodes": N,
            "ms_per_step": round(t_tpu / N_STEPS * 1e3, 2),
            "ms_per_newton_iter": round(t_tpu / max(n_newton, 1) * 1e3, 2),
            "newton_iters": n_newton,
            "spread_ms": round(t_std / N_STEPS * 1e3, 2),
            "reps": REPS,
        }
        try:
            t_cpu = _cpu_seconds(run_p, u0_p, key_p)
            rec["vs_baseline"] = round(t_cpu / t_tpu, 3)
            rec["cpu_ms_per_step"] = round(t_cpu / N_STEPS * 1e3, 2)
        except Exception as e:
            rec["cpu_error"] = f"{type(e).__name__}: {e}"
        return rec

    if config == "sweep":
        lanes = 4
        run_s, args_s, key_s, N_s = _build_pore_sweep(lanes)
        t_s, t_s_std, n_newton_s = _timed_run(run_s, args_s, accel)
        lane_steps = N_STEPS * lanes
        rec = {
            "lanes": lanes,
            "mesh_nodes": N_s,
            "ms_per_lane_step": round(t_s / lane_steps * 1e3, 2),
            "newton_iters": n_newton_s,
            "spread_ms": round(t_s_std / lane_steps * 1e3, 2),
        }
        try:
            t_cpu_s = _cpu_seconds(run_s, args_s, key_s)
            rec["vs_baseline"] = round(t_cpu_s / t_s, 3)
            rec["cpu_ms_per_lane_step"] = round(
                t_cpu_s / lane_steps * 1e3, 2)
        except Exception as e:
            rec["cpu_error"] = f"{type(e).__name__}: {e}"
        return rec

    if config == "edl":
        run_e, u0_e, key_e, n_e = _build_edl()
        t_tpu_e, t_std_e, n_newton_e = _timed_run(run_e, u0_e, accel)
        rec = {
            "ms_per_step": round(t_tpu_e / n_e * 1e3, 3),
            "ms_per_newton_iter": round(
                t_tpu_e / max(n_newton_e, 1) * 1e3, 3),
            "newton_iters": n_newton_e,
            "spread_ms": round(t_std_e / n_e * 1e3, 3),
        }
        try:
            t_cpu_e = _cpu_seconds(run_e, u0_e, key_e)
            rec["vs_baseline"] = round(t_cpu_e / t_tpu_e, 3)
            rec["cpu_ms_per_step"] = round(t_cpu_e / n_e * 1e3, 3)
        except Exception as e:
            rec["cpu_error"] = f"{type(e).__name__}: {e}"
        return rec

    raise ValueError(config)


def main():
    """Each config runs in its own subprocess: a TPU worker crash in one
    (e.g. an OOM-ing sweep kernel) cannot take down the others — the
    2026-08-17 bench run lost the edl1d number to a sweep-config fault."""
    import subprocess
    import sys

    if len(sys.argv) > 2 and sys.argv[1] == "--config":
        print("BENCHCFG" + json.dumps(_child(sys.argv[2])))
        return

    extra = {}
    for name, key, timeout in (("pore", "pore3d", 3000),
                               ("edl", "edl1d", 2000),
                               ("sweep", "pore3d_sweep", 3000)):
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--config", name],
                capture_output=True, text=True, timeout=timeout)
            lines = [ln for ln in p.stdout.splitlines()
                     if ln.startswith("BENCHCFG")]
            if not lines:
                tail = (p.stderr or "").strip().splitlines()[-3:]
                raise RuntimeError(
                    f"rc={p.returncode}: {' | '.join(tail)[-400:]}")
            extra[key] = json.loads(lines[-1][len("BENCHCFG"):])
        except Exception as e:
            extra[key] = {"error": f"{type(e).__name__}: {str(e)[:400]}"}

    pore = extra.get("pore3d", {})
    print(json.dumps({
        "metric": "pore3d_gmpnp_transient_step_L50R5",
        "value": pore.get("ms_per_step"),
        "unit": "ms/step",
        "vs_baseline": pore.get("vs_baseline"),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
