"""Headline benchmark: the five BASELINE configs on real hardware.

BASELINE.json's configs (SURVEY.md §6, BASELINE.md):
  1. 1D reaction-diffusion planar    — 5 fields x 5,991 nodes x 500 steps
     (1D/rxn_diff_planar.py:169-206)
  2. 1D GMPNP EDL (flagship 1D)      — 7 fields x 1,091 nodes, dry-run
     window (1D/MPNP_CO2ER_EDL.py:216-290); plus the PRODUCTION operating
     point: the 8-lane voltage sweep (README.md:37-39)
  3. Stern post-solve                — closed-form + ODE, 5 voltages
     (1D/Stern_CO2ER.py:179-180); host-side, recorded for completeness
  4. 3D rxn-diff pore at L_50_R_5    — 7 fields x 3,679 nodes
     (3D/rxn_diff_CO2ER_pore.py:287-323)
  5. 3D GMPNP pore at L_50_R_5       — 9 fields x 3,679 nodes (the
     headline; 3D/MPNP_CO2ER_pore.py:329-365), single-config AND the
     4-lane voltage sweep AT THE REFERENCE MESH (per-lane Dirichlet via
     the arithmetic BC — the where/select form kernel-faults under vmap,
     probes/probe_r3_a.py)

Protocol (BENCH v6): AOT-compile, one warm-up execution, then the median
of REPS timed executions each ending in a value fetch — ON BOTH BACKENDS
(round 2 timed the CPU baseline with reps=1; VERDICT r2 weak #4 called
the asymmetry).  CPU costs are cached in bench_cpu_baseline.json keyed by
config+protocol version.  3D transients use an N_STEPS-step window; the
1D configs run their full reference schedules.

Each config runs in its own subprocess: a TPU worker crash in one config
cannot take down the others.  Prints ONE JSON line; if the headline
config failed, a top-level "error" field is set (ADVICE r2: a null value
must be distinguishable from a measured one).
"""

import json
import os
import time

import numpy as np

N_STEPS = 8
REPS = 3
VER = "v6"
HERE = os.path.dirname(os.path.abspath(__file__))
_CPU_CACHE = os.path.join(HERE, "bench_cpu_baseline.json")
os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")


def _scan_transient(prog, step, n_steps, carry_extra, update_carry=None):
    import jax
    import jax.numpy as jnp

    def run(u0):
        def body(carry, i):
            u, extra = carry
            th = prog._theta_of_carry((u, extra), i)
            u_new, st = step(u, th)
            if update_carry is not None:
                extra = update_carry(extra, u_new, i)
            return (u_new, extra), st.newton_iters

        (u, _), iters = jax.lax.scan(
            body, (u0, carry_extra), jnp.arange(n_steps))
        return u, iters

    return run


def _scan_transient_carried(prog, step, prep_init, n_steps, carry_extra):
    """Stateful-step variant: the slab factorization rides the scan carry
    (timeloop.make_carried_step — the fast 3D production mode)."""
    import jax
    import jax.numpy as jnp

    def run(u0):
        th0 = prog._theta_of_carry((u0, carry_extra), jnp.asarray(0))
        prep0 = prep_init(u0, th0)

        def body(carry, i):
            u, extra, prep = carry
            th = prog._theta_of_carry((u, extra), i)
            u_new, st, prep = step(u, th, prep)
            return (u_new, extra, prep), st.newton_iters

        (u, _, _), iters = jax.lax.scan(
            body, (u0, carry_extra, prep0), jnp.arange(n_steps))
        return u, iters

    return run


def _pore_run(prog, cfg, refresh):
    """Build the timed N_STEPS transient for a pore program: exact Newton
    (refresh='iter' — the reference MUMPS-semantics program, used as the
    single-CPU-core baseline) or the carried-factor production mode
    (refresh='carried': 745.8 -> 534.0 ms/step GMPNP, 2228 -> 1422 rxn_diff
    on TPU at the shipped mesh; states match exact Newton to <1e-6 rel-L2,
    probes/probe_r3_ad.py)."""
    import dataclasses

    import jax.numpy as jnp

    if refresh == "carried":
        from gmpnp_tpu.solve.timeloop import make_carried_step

        lin = dataclasses.replace(cfg.linear, refresh="carried")
        step, prep_init = make_carried_step(
            prog.space, prog.form, cfg.newton, lin,
            bc_of_theta=prog._bc_of_theta)
        return _scan_transient_carried(prog, step, prep_init, N_STEPS,
                                       jnp.asarray(0.0))
    from gmpnp_tpu.solve.timeloop import make_implicit_step

    step = make_implicit_step(prog.space, prog.form, cfg.newton, cfg.linear,
                              bc_of_theta=prog._bc_of_theta)
    return _scan_transient(prog, step, N_STEPS, jnp.asarray(0.0))


def _build_pore(refresh="carried"):
    import jax.numpy as jnp

    from gmpnp_tpu.models import pore_3d

    cfg = pore_3d.Pore3DConfig(physics="GMPNP", L=50e-9, R=5e-9)
    prog = pore_3d.build(cfg)
    nf, ns = cfg.n_fields, len(cfg.species)
    run = _pore_run(prog, cfg, refresh)
    u0 = jnp.ones((prog.space.num_vertices, nf)).at[:, ns].set(0.0)
    mode = "slab-carried" if refresh == "carried" else "slab"
    key = (f"pore3d_gmpnp/L50R5/N{prog.space.num_vertices}"
           f"/steps{N_STEPS}/{mode}/{VER}")
    return run, u0, key, N_STEPS


def _build_pore_xl(refresh="carried"):
    """Beyond-reference scale: 3D GMPNP at a generated 12,319-vertex
    cylinder mesh — 3.3x the shipped reference mesh's DoFs (the largest
    point of the round-3 scaling envelope, runs/study_r3_scaling.json;
    ms/step stays near-linear in N with no VMEM wall)."""
    import jax.numpy as jnp

    from gmpnp_tpu.models import pore_3d

    os.environ.pop("GMPNP_UTILITIES", None)   # force the generator
    cfg = pore_3d.Pore3DConfig(physics="GMPNP", L=50e-9, R=5e-9,
                               mesh_resolution=(6, 96))
    prog = pore_3d.build(cfg)
    nf, ns = cfg.n_fields, len(cfg.species)
    run = _pore_run(prog, cfg, refresh)
    u0 = jnp.ones((prog.space.num_vertices, nf)).at[:, ns].set(0.0)
    mode = "slab-carried" if refresh == "carried" else "slab"
    key = (f"pore3d_gmpnp_xl/gen6x96/N{prog.space.num_vertices}"
           f"/steps{N_STEPS}/{mode}/{VER}")
    return run, u0, key, N_STEPS


def _build_rxn3d(refresh="carried"):
    """BASELINE config 4: 3D rxn-diff pore at the shipped L_50_R_5."""
    import jax.numpy as jnp

    from gmpnp_tpu.models import pore_3d

    cfg = pore_3d.Pore3DConfig(physics="rxn_diff", L=50e-9, R=5e-9)
    prog = pore_3d.build(cfg)
    run = _pore_run(prog, cfg, refresh)
    u0 = jnp.ones((prog.space.num_vertices, cfg.n_fields))
    mode = "slab-carried" if refresh == "carried" else "slab"
    key = (f"pore3d_rxndiff/L50R5/N{prog.space.num_vertices}"
           f"/steps{N_STEPS}/{mode}/{VER}")
    return run, u0, key, N_STEPS


def _build_edl(refresh="carried"):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gmpnp_tpu.models import edl_1d

    cfg = edl_1d.EDL1DConfig(L_n=1.0e-6, dry_run=True)
    prog = edl_1d.build(cfg)
    n = 100   # dry-run schedule length (ref 1D/MPNP_CO2ER_EDL.py:256-268)
    chf0 = jnp.asarray(0.001 if cfg.H_OHP is not None else 0.0)
    if refresh == "carried":
        from gmpnp_tpu.solve.timeloop import make_carried_step

        lin = dataclasses.replace(cfg.linear, refresh="carried")
        step, prep_init = make_carried_step(
            prog.space, prog.form, cfg.newton, lin,
            bc_of_theta=lambda theta: prog.bc)

        def run(u0):
            th0 = prog._theta_of_carry((u0, chf0), jnp.asarray(0))
            prep0 = prep_init(u0, th0)

            def body(carry, i):
                u, chf, prep = carry
                th = prog._theta_of_carry((u, chf), i)
                u_new, st, prep = step(u, th, prep)
                chf = prog._update_carry(chf, u_new, i)
                return (u_new, chf, prep), st.newton_iters

            (u, _, _), iters = jax.lax.scan(
                body, (u0, chf0, prep0), jnp.arange(n))
            return u, iters
    else:
        from gmpnp_tpu.solve.timeloop import make_implicit_step

        step = make_implicit_step(
            prog.space, prog.form, cfg.newton, cfg.linear,
            bc_of_theta=lambda theta: prog.bc)
        run = _scan_transient(prog, step, n, chf0,
                              update_carry=prog._update_carry)
    u0 = jnp.concatenate(
        [jnp.ones((prog.space.num_vertices, 6)),
         jnp.zeros((prog.space.num_vertices, 1))], axis=1)
    mode = "cr-carried" if refresh == "carried" else "cr"
    key = f"edl1d_gmpnp/1um/N{prog.space.num_vertices}/steps{n}/{mode}/{VER}"
    return run, u0, key, n


def _build_rxn1d():
    """BASELINE config 1: 1D rxn-diff planar, 50um mesh (N=5991), the FULL
    500-step schedule (dt=2e-2 s, T=10 s; 1D/rxn_diff_planar.py:169-206)."""
    import jax.numpy as jnp

    from gmpnp_tpu.models import rxn_diff_1d
    from gmpnp_tpu.solve.timeloop import make_implicit_step

    cfg = rxn_diff_1d.RxnDiff1DConfig(L_n=50.0e-6)
    prog = rxn_diff_1d.build(cfg)
    n = prog.num_steps
    step = make_implicit_step(prog.space, prog.form, cfg.newton, cfg.linear,
                              bc_of_theta=lambda theta: prog.bc)

    import jax

    def run(u0):
        def body(carry, i):
            u_new, st = step(carry, prog.theta)
            return u_new, st.newton_iters

        u, iters = jax.lax.scan(body, u0, jnp.arange(n))
        return u, iters

    u0 = jnp.ones((prog.space.num_vertices, 5))
    key = f"rxndiff1d/50um/N{prog.space.num_vertices}/steps{n}/cr/{VER}"
    return run, u0, key, n


def _build_edl_sweep(lanes=8):
    """Config-2 production operating point: 8-lane vmapped voltage sweep
    of the 1D EDL dry-run window (the reference runs these as independent
    cluster jobs, README.md:37-39).  Backtracking is ON with the
    production sweep config (non-monotone bounded-growth acceptance,
    parallel.sweep._sweep_newton): the sweep spans the published voltage
    range down to V=-12.5, where plain damped Newton diverges from the
    cold start at every dt (probes/probe_r3_o.py) — without recovery the
    -12.5 lane is NaN.  The growth rule converges that lane in 231
    Newton iterations over the window vs strict Armijo's 308 (Armijo
    stalls on healthy transient overshoots)."""
    import jax
    import jax.numpy as jnp

    from gmpnp_tpu.models import edl_1d
    from gmpnp_tpu.parallel.sweep import _sweep_newton
    from gmpnp_tpu.solve.timeloop import make_implicit_step

    cfg = edl_1d.EDL1DConfig(L_n=1.0e-6, dry_run=True)
    prog = edl_1d.build(cfg)
    P = edl_1d.P
    left = np.unique(
        prog.mesh.facets[prog.mesh.facet_markers == 1].reshape(-1))
    newton = _sweep_newton(cfg.newton)
    step = make_implicit_step(
        prog.space, prog.form, newton, cfg.linear,
        bc_of_theta=lambda theta: prog.bc.arith().set_value_arith(
            left, P, theta["voltage"]))
    n = 100

    def run(u0v, voltages):
        def single(u0_l, voltage):
            def body(carry, i):
                u, chf = carry
                th = prog._theta_of_carry((u, chf), i)
                th["voltage"] = voltage
                u_new, st = step(u, th)
                chf = prog._update_carry(chf, u_new, i)
                return (u_new, chf), st.newton_iters

            (u, _), iters = jax.lax.scan(
                body, (u0_l, jnp.asarray(0.0)), jnp.arange(n))
            return u, iters

        return jax.vmap(single)(u0v, voltages)

    u0 = jnp.concatenate(
        [jnp.ones((prog.space.num_vertices, 6)),
         jnp.zeros((prog.space.num_vertices, 1))], axis=1)
    u0v = jnp.stack([u0] * lanes)
    volts = jnp.asarray(np.linspace(-1.0, -12.5, lanes))
    key = (f"edl1d_sweep/1um/N{prog.space.num_vertices}"
           f"/steps{n}x{lanes}/cr-btg4/{VER}")
    return run, (u0v, volts), key, n * lanes


def _build_pore_sweep(lanes=4, refresh="carried"):
    """BASELINE config 5 as written: the 3D GMPNP voltage sweep AT THE
    REFERENCE MESH (shipped L_50_R_5, N=3679), HOST-chunked (the
    production large-mesh mode, parallel.sweep._auto_chunk): ONE compiled
    single-lane program with the wall voltage and Sechenov CO2 value as
    traced arguments through the pure-arithmetic BC
    (fem.dirichlet.ArithDirichletBC), executed once per lane.  Any
    single program holding 4+ transient replicas — vmap, lax.map, or
    map-of-vmap, any lane values — crashes the tunneled TPU worker on
    execution at this mesh size (probes/probe_r3_p.py), and batching is
    slower anyway (one lane saturates the chip: 3,030 ms/lane-step
    vmap-2 vs ~950 host-chunked).

    Lanes span the reference's 3D operating regime up to its default
    wall voltage (voltage_multiplier=-1.0, 3D/MPNP_CO2ER_pore.py:98);
    the published DEEP voltages (-2.5..-12.5) belong to the 1D EDL model
    (1D/Stern_CO2ER.py:66-68), which this framework runs to V=-12.5
    full-length (docs/STATUS.md).  Beyond ~-1.5 the 3D cold start at
    full dt=1e-3 s exceeds backward Euler's convergence basin ON THE
    SHIPPED MESH for any Newton globalization tried (backtracking
    included; non-monotonic in V: -2.5 needs dt/8, -1.5 needs dt/32 —
    /tmp dt study 2026-08-18); the reference, which cold-starts the same
    way with no recovery at all, would die identically there.
    Backtracking stays ON with the production sweep config (non-monotone
    bounded-growth rule, parallel.sweep._sweep_newton); for these
    healthy lanes the iterate sequence is identical to plain damped
    Newton."""
    import jax
    import jax.numpy as jnp

    from gmpnp_tpu.models import pore_3d

    cfg = pore_3d.Pore3DConfig(physics="GMPNP", L=50e-9, R=5e-9)
    prog = pore_3d.build(cfg)
    nf, ns = cfg.n_fields, len(cfg.species)
    s2 = np.unique(
        prog.mesh.facets[prog.mesh.facet_markers == pore_3d.S2].reshape(-1))

    def bc_of_theta(theta):
        bc = prog.bc.arith()
        bc = bc.set_value_arith(prog.s1_verts, prog.idx["CO2"],
                                theta["co2_s1"])
        return bc.set_value_arith(s2, ns, theta["voltage"])

    import dataclasses

    from gmpnp_tpu.parallel.sweep import _sweep_newton

    newton = _sweep_newton(cfg.newton)
    if refresh == "carried":
        from gmpnp_tpu.solve.timeloop import make_carried_step

        lin = dataclasses.replace(cfg.linear, refresh="carried")
        step_c, prep_init = make_carried_step(
            prog.space, prog.form, newton, lin, bc_of_theta=bc_of_theta)

        def single(u0_l, voltage):
            th0 = prog._theta_of_carry((u0_l, jnp.asarray(0.0)),
                                       jnp.asarray(0))
            th0["voltage"] = voltage
            prep0 = prep_init(u0_l, th0)

            def body(carry, i):
                u, extra, prep = carry
                th = prog._theta_of_carry((u, extra), i)
                th["voltage"] = voltage
                u_new, st, prep = step_c(u, th, prep)
                return (u_new, extra, prep), st.newton_iters

            (u, _, _), iters = jax.lax.scan(
                body, (u0_l, jnp.asarray(0.0), prep0), jnp.arange(N_STEPS))
            return u, iters
    else:
        from gmpnp_tpu.solve.timeloop import make_implicit_step

        step = make_implicit_step(prog.space, prog.form, newton, cfg.linear,
                                  bc_of_theta=bc_of_theta)

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

    u0 = jnp.ones((prog.space.num_vertices, nf)).at[:, ns].set(0.0)
    volts = jnp.asarray(np.linspace(-0.25, -1.0, lanes))
    mode = "btg4-carried" if refresh == "carried" else "btg4"
    key = (f"pore3d_sweep/L50R5/N{prog.space.num_vertices}"
           f"/steps{N_STEPS}x{lanes}/v0.25-1.0-{mode}/{VER}")
    return single, (u0, volts), key, prog.space.num_vertices


def _timed_sweep_host(single, u0, volts, device, reps=REPS):
    """Host-chunked sweep timing: AOT-compile the single-lane program
    once (voltage is a traced argument), then per rep execute every lane
    and fetch each lane's checksum; median over reps."""
    import jax

    u0d = jax.device_put(u0, device)
    voltsd = [jax.device_put(v, device) for v in np.asarray(volts)]
    compiled = jax.jit(single).lower(u0d, voltsd[0]).compile()
    n_newton = 0
    for v in voltsd:                       # warm-up, all lanes
        out, iters = compiled(u0d, v)
        chk = float(abs(out).sum())
        assert np.isfinite(chk), "non-finite sweep lane"
        n_newton += int(np.asarray(iters).sum())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for v in voltsd:
            out, iters = compiled(u0d, v)
            float(abs(out).sum())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), float(np.std(ts)), n_newton


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
    """Same compiled program on the host CPU backend — SAME median-of-REPS
    protocol as the accelerator measurement (cached by key+version)."""
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
    t, _, _ = _timed_run(run, args, cpu, reps=REPS)
    cache[key] = t
    with open(_CPU_CACHE, "w") as f:
        json.dump(cache, f, indent=1)
    return t


def _transient_record(build, per_key, accel, cpu_build=None):
    """Time ``build()``'s program on the accelerator; baseline against
    ``cpu_build()``'s program on one CPU core (default: the same program).

    A distinct cpu_build keeps the baseline on the reference-semantics
    program (exact Newton — the MUMPS-per-iterate proxy for what FEniCS
    actually executes) while the accelerator runs the framework's fast
    production mode (carried-factor chord Newton); the record names both
    keys so the comparison is explicit."""
    run, args, key, denom = build()
    t, t_std, n_newton = _timed_run(run, args, accel)
    rec = {
        per_key: round(t / denom * 1e3, 3),
        "ms_per_newton_iter": round(t / max(n_newton, 1) * 1e3, 3),
        "newton_iters": n_newton,
        "spread_ms": round(t_std / denom * 1e3, 3),
        "reps": REPS,
        "key": key,
    }
    try:
        if cpu_build is not None:
            run_c, args_c, key_c, _ = cpu_build()
            t_cpu = _cpu_seconds(run_c, args_c, key_c)
            rec["cpu_key"] = key_c
            rec["cpu_protocol"] = ("exact-Newton program (reference "
                                   "MUMPS-semantics proxy) on one core")
        else:
            t_cpu = _cpu_seconds(run, args, key)
        rec["vs_baseline"] = round(t_cpu / t, 3)
        rec[f"cpu_{per_key}"] = round(t_cpu / denom * 1e3, 3)
    except Exception as e:
        rec["cpu_error"] = f"{type(e).__name__}: {e}"
    return rec


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
        rec = _transient_record(
            lambda: _build_pore("carried"), "ms_per_step", accel,
            cpu_build=lambda: _build_pore("iter"))
        rec["mesh_nodes"] = 3679
        return rec

    if config == "xl":
        rec = _transient_record(
            lambda: _build_pore_xl("carried"), "ms_per_step", accel,
            cpu_build=lambda: _build_pore_xl("iter"))
        rec["mesh_nodes"] = 12319
        rec["note"] = ("beyond-reference scale: 3.3x the shipped mesh's "
                       "DoFs; lanes 1-8 flat at the shipped mesh, see "
                       "runs/study_r3_scaling.json")
        return rec

    if config == "rxn3d":
        rec = _transient_record(
            lambda: _build_rxn3d("carried"), "ms_per_step", accel,
            cpu_build=lambda: _build_rxn3d("iter"))
        rec["mesh_nodes"] = 3679
        return rec

    if config == "edl":
        return _transient_record(
            lambda: _build_edl("carried"), "ms_per_step", accel,
            cpu_build=lambda: _build_edl("iter"))

    if config == "rxn1d":
        rec = _transient_record(_build_rxn1d, "ms_per_step", accel)
        rec["mesh_nodes"] = 5991
        return rec

    if config == "edl_sweep":
        lanes = 8
        rec = _transient_record(lambda: _build_edl_sweep(lanes),
                                "ms_per_lane_step", accel)
        rec["lanes"] = lanes
        return rec

    if config == "sweep":
        lanes = 4
        single, (u0, volts), key, N = _build_pore_sweep(lanes, "carried")
        lane_steps = lanes * N_STEPS
        t, t_std, n_newton = _timed_sweep_host(single, u0, volts, accel)
        rec = {
            "ms_per_lane_step": round(t / lane_steps * 1e3, 3),
            "ms_per_newton_iter": round(t / max(n_newton, 1) * 1e3, 3),
            "newton_iters": n_newton,
            "spread_ms": round(t_std / lane_steps * 1e3, 3),
            "reps": REPS,
            "key": key,
            "lanes": lanes,
            "mesh_nodes": N,
            "mode": "host-chunked (one compiled program, executed per "
                    "lane; see _build_pore_sweep docstring)",
        }
        try:
            # CPU baseline: the exact-Newton program (reference
            # MUMPS-semantics proxy; see _transient_record docstring)
            single_b, (u0_b, volts_b), key_b, _ = _build_pore_sweep(
                lanes, "iter")
            cache = {}
            if os.path.exists(_CPU_CACHE):
                try:
                    cache = json.load(open(_CPU_CACHE))
                except Exception:
                    cache = {}
            if cache.get(key_b) is not None:
                t_cpu = float(cache[key_b])
            else:
                cpu = jax.devices("cpu")[0]
                t_cpu, _, _ = _timed_sweep_host(single_b, u0_b, volts_b, cpu)
                cache[key_b] = t_cpu
                with open(_CPU_CACHE, "w") as f:
                    json.dump(cache, f, indent=1)
            rec["cpu_key"] = key_b
            rec["cpu_protocol"] = ("exact-Newton program (reference "
                                   "MUMPS-semantics proxy) on one core")
            rec["vs_baseline"] = round(t_cpu / t, 3)
            rec["cpu_ms_per_lane_step"] = round(t_cpu / lane_steps * 1e3, 3)
        except Exception as e:
            rec["cpu_error"] = f"{type(e).__name__}: {e}"
        return rec

    if config == "stern":
        # host-side post-solve (config 3): closed-form BDM + linear model
        # over the 5-voltage published table (1D/Stern_CO2ER.py:179-180)
        from gmpnp_tpu.models import stern

        t0 = time.perf_counter()
        out = stern.run(write=False, make_plots=False)
        dt = time.perf_counter() - t0
        return {"ms_total": round(dt * 1e3, 2), "voltages": len(out),
                "note": "host-side post-processor; no TPU path"}

    raise ValueError(config)


def main():
    """Each config runs in its own subprocess: a TPU worker crash in one
    (e.g. an OOM-ing sweep kernel) cannot take down the others."""
    import subprocess
    import sys

    if len(sys.argv) > 2 and sys.argv[1] == "--config":
        print("BENCHCFG" + json.dumps(_child(sys.argv[2])))
        return

    only = sys.argv[1:] or None
    extra = {}
    for name, key, timeout in (("pore", "pore3d", 3000),
                               ("xl", "pore3d_gmpnp_xl", 4200),
                               ("rxn3d", "pore3d_rxndiff", 3000),
                               ("edl", "edl1d", 2000),
                               ("rxn1d", "rxndiff1d", 2400),
                               ("edl_sweep", "edl1d_sweep", 3600),
                               ("sweep", "pore3d_sweep", 3600),
                               ("stern", "stern", 300)):
        if only and name not in only:
            continue
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
    out = {
        "metric": "pore3d_gmpnp_transient_step_L50R5",
        "value": pore.get("ms_per_step"),
        "unit": "ms/step",
        "vs_baseline": pore.get("vs_baseline"),
        "extra": extra,
    }
    if "error" in pore or pore.get("ms_per_step") is None:
        # ADVICE r2: consumers must be able to tell "failed" from
        # "measured null"
        out["error"] = pore.get("error", "headline config not measured")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
