"""Headline benchmark: 3D GMPNP pore voltage-sweep throughput.

BASELINE.json's config 5 is "3D GMPNP pore with voltage/cation sweep" — and
parameter sweeps are the reference's actual production mode (independent
cluster jobs per flag setting, README.md:37-39).  This benchmark runs the
first N_STEPS backward-Euler steps of the 3D GMPNP pore transient for
SWEEP_W wall voltages as ONE vmapped XLA program (damped Newton, BiCGStab +
block-Jacobi inner solves, per-step Sechenov BC update per lane) and reports
the throughput per (config x step).  Mesh: generated cylinder at (3 rings,
24 layers), the largest batched workload that fits the current toolchain's
tile-padding behavior in HBM (docs/TPU_NOTES.md).

vs_baseline compares against a single host CPU core doing the same work
sequentially (the BASELINE.json axis: "target >= 10x single-CPU-core"):
    vs_baseline = cpu_seconds_per_config_step / sweep_seconds_per_config_step
The CPU single-config cost is measured once and cached in-repo
(bench_cpu_baseline.json), keyed by the benchmark config.

Timing protocol: jax-AOT compile, then exactly ONE timed execution ending in
a value fetch — on the tunneled TPU backend re-executing a compiled program
faults the worker and block_until_ready does not surface async faults
(docs/TPU_NOTES.md).

Prints ONE JSON line:
    {"metric": ..., "value": ms per config-step, "unit": "ms/step",
     "vs_baseline": ...}
"""

import json
import os
import time

N_STEPS = 8           # timed transient window (from the initial state)
SWEEP_W = 8           # vmapped voltage lanes
_CPU_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bench_cpu_baseline.json")
_BENCH_KEY = "pore3d_gmpnp/r3l24/steps8/bj/v3"


def _build(n_rings=3, n_layers=24):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gmpnp_tpu.models import pore_3d
    from gmpnp_tpu.solve.timeloop import make_implicit_step

    cfg = pore_3d.Pore3DConfig(
        physics="GMPNP", L=100e-9, R=10e-9,
        mesh_resolution=(n_rings, n_layers))
    prog = pore_3d.build(cfg)
    nf = cfg.n_fields
    ns = len(cfg.species)

    s2 = np.unique(prog.mesh.facets[
        prog.mesh.facet_markers == pore_3d.S2].reshape(-1))

    def bc_of_theta(theta):
        bc = prog.bc.set_value(prog.s1_verts, prog.idx["CO2"],
                               theta["co2_s1"])
        if "voltage" in theta:
            bc = bc.set_value(s2, ns, theta["voltage"])
        return bc

    step = make_implicit_step(
        prog.space, prog.form, cfg.newton, cfg.linear,
        bc_of_theta=bc_of_theta)

    def make_run(n, sweep):
        def run_one(u0, v):
            def body(carry, i):
                u, extra = carry
                theta = prog._theta_of_carry((u, extra), i)
                if sweep:
                    theta["voltage"] = v
                u_new, stats = step(u, theta)
                return (u_new, extra), stats.newton_iters

            (u, _), iters = jax.lax.scan(
                body, (u0, jnp.asarray(0.0)), jnp.arange(n))
            return u, iters

        return run_one

    u0 = jnp.ones((prog.space.num_vertices, nf)).at[:, ns].set(0.0)
    return make_run, u0, prog


def _aot_time(fn, args, device):
    """Compile ahead of time; time exactly one execution + scalar fetch."""
    import jax

    args = [jax.device_put(a, device) for a in args]
    compiled = jax.jit(fn).lower(*args).compile()
    t0 = time.perf_counter()
    out, iters = compiled(*args)
    chk = float(abs(out).sum())
    dt = time.perf_counter() - t0
    assert chk == chk and chk != float("inf"), "non-finite bench result"
    return dt, iters


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    make_run, u0, prog = _build()
    accel = jax.devices()[0]

    # Single-config transient.  The vmapped voltage sweep (the intended
    # headline, parallel/sweep.py; exact on CPU) currently faults the TPU
    # worker under the toolchain's tile-padding/vmap behavior — see
    # docs/TPU_NOTES.md; revisit when the runtime issue is resolved.
    run_one = make_run(N_STEPS, sweep=False)
    sweep_s, _ = _aot_time(lambda u: run_one(u, None), [u0], accel)
    per_config_step = sweep_s / N_STEPS

    # single-CPU-core single-config reference (cached)
    vs_baseline = None
    try:
        cpu = jax.devices("cpu")[0]
        cpu_s_per_step = None
        if os.path.exists(_CPU_CACHE):
            c = json.load(open(_CPU_CACHE))
            if c.get("key") == _BENCH_KEY:
                cpu_s_per_step = c["cpu_s_per_step"]
        if cpu_s_per_step is None:
            run_cpu = make_run(N_STEPS, sweep=False)
            cpu_total, _ = _aot_time(
                lambda u: run_cpu(u, None), [u0], cpu)
            cpu_s_per_step = cpu_total / N_STEPS
            with open(_CPU_CACHE, "w") as f:
                json.dump({"key": _BENCH_KEY,
                           "cpu_s_per_step": cpu_s_per_step}, f)
        vs_baseline = cpu_s_per_step / per_config_step
    except Exception:
        vs_baseline = None

    print(json.dumps({
        "metric": "pore3d_gmpnp_transient_step",
        "value": round(per_config_step * 1e3, 3),
        "unit": "ms/step",
        "vs_baseline": (round(vs_baseline, 3)
                        if vs_baseline is not None else None),
    }))


if __name__ == "__main__":
    main()
